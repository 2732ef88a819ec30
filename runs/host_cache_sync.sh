#!/bin/bash
# Sync the per-machine host cache (~/.cache/diffphore_tpu: SO(3)/torus tables
# + the persistent XLA compile cache) into the repo and back, so a recycled
# container resumes training/inference without the 2-4 min table build and
# the multi-minute TPU recompiles.
#
#   bash runs/host_cache_sync.sh pull   # repo -> home (run BEFORE any jax job)
#   bash runs/host_cache_sync.sh push   # home -> repo + commit (periodic)
#
# The repo copy lives in data/cache/host/ (force-added; data/cache is
# gitignored).  push skips committing when the tree copy exceeds 120 MB --
# the compile cache is an optimization, not an artifact.
set -u
cd /root/repo
HOME_CACHE="$HOME/.cache/diffphore_tpu"
REPO_CACHE="data/cache/host"

case "${1:-}" in
  pull)
    [ -d "$REPO_CACHE" ] || { echo "[cache_sync] nothing to pull"; exit 0; }
    mkdir -p "$HOME_CACHE"
    cp -rn "$REPO_CACHE"/. "$HOME_CACHE"/ 2>/dev/null
    echo "[cache_sync] pulled $(du -sh "$HOME_CACHE" | cut -f1) into $HOME_CACHE"
    ;;
  push)
    [ -d "$HOME_CACHE" ] || { echo "[cache_sync] no home cache"; exit 0; }
    mkdir -p "$REPO_CACHE"
    cp -ru "$HOME_CACHE"/. "$REPO_CACHE"/ 2>/dev/null
    SZ_KB=$(du -sk "$REPO_CACHE" | cut -f1)
    if [ "$SZ_KB" -gt 122880 ]; then
      echo "[cache_sync] $REPO_CACHE is ${SZ_KB}K (>120M), not committing"
      exit 0
    fi
    git add -f "$REPO_CACHE" >/dev/null 2>&1
    git commit -q -m "host-cache snapshot: SO(3)/torus tables + XLA compile cache (${SZ_KB}K)

No-Verification-Needed: cache files only, no code change" 2>/dev/null \
      && echo "[cache_sync] committed ${SZ_KB}K" \
      || echo "[cache_sync] nothing new to commit"
    ;;
  *)
    echo "usage: $0 {pull|push}"; exit 1;;
esac
