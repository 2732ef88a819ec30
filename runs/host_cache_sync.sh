#!/bin/bash
# Sync the per-machine host cache (~/.cache/diffphore_tpu: SO(3)/torus tables
# + the persistent XLA compile cache) into the repo and back, so a recycled
# container resumes training/inference without the 2-4 min table build and
# the multi-minute TPU recompiles.
#
#   bash runs/host_cache_sync.sh pull   # ref/tree -> home (run BEFORE any jax job)
#   bash runs/host_cache_sync.sh push   # home -> single force-updated ref (periodic)
#
# ADVICE r3: snapshots no longer land in main history (the old scheme grew
# the repo by 19-91 MB of mutating binary blobs per snapshot).  push writes
# the cache tree to the ORPHAN ref refs/cache/host via plumbing (temp index
# -> write-tree -> commit-tree -> update-ref): exactly one snapshot is ever
# reachable, superseded blobs become garbage, and main history stays code.
# pull restores from that ref and uses cp -ru so stale home-cache files are
# refreshed, not skipped.
set -u
cd /root/repo
HOME_CACHE="$HOME/.cache/diffphore_tpu"
REPO_CACHE="data/cache/host"
REF=refs/cache/host

case "${1:-}" in
  pull)
    if [ ! -d "$REPO_CACHE" ] && git rev-parse -q --verify "$REF" >/dev/null; then
      TMPIDX=$(mktemp -u)
      GIT_INDEX_FILE=$TMPIDX git read-tree "$REF"
      GIT_INDEX_FILE=$TMPIDX git checkout-index -a -f --prefix=./
      rm -f "$TMPIDX"
      echo "[cache_sync] restored $REPO_CACHE from $REF"
    fi
    [ -d "$REPO_CACHE" ] || { echo "[cache_sync] nothing to pull"; exit 0; }
    mkdir -p "$HOME_CACHE"
    cp -ru "$REPO_CACHE"/. "$HOME_CACHE"/ 2>/dev/null
    echo "[cache_sync] pulled $(du -sh "$HOME_CACHE" | cut -f1) into $HOME_CACHE"
    ;;
  push)
    [ -d "$HOME_CACHE" ] || { echo "[cache_sync] no home cache"; exit 0; }
    mkdir -p "$REPO_CACHE"
    cp -ru "$HOME_CACHE"/. "$REPO_CACHE"/ 2>/dev/null
    SZ_KB=$(du -sk "$REPO_CACHE" | cut -f1)
    if [ "$SZ_KB" -gt 262144 ]; then
      echo "[cache_sync] $REPO_CACHE is ${SZ_KB}K (>256M), not snapshotting"
      exit 0
    fi
    TMPIDX=$(mktemp -u)
    GIT_INDEX_FILE=$TMPIDX git add -f "$REPO_CACHE" 2>/dev/null
    TREE=$(GIT_INDEX_FILE=$TMPIDX git write-tree)
    rm -f "$TMPIDX"
    if git rev-parse -q --verify "$REF" >/dev/null && \
       [ "$(git rev-parse "$REF^{tree}")" = "$TREE" ]; then
      echo "[cache_sync] nothing new to snapshot"
      exit 0
    fi
    COMMIT=$(git commit-tree "$TREE" -m "host-cache snapshot (${SZ_KB}K)")
    git update-ref "$REF" "$COMMIT"
    echo "[cache_sync] $REF -> ${SZ_KB}K snapshot (outside main history)"
    ;;
  *)
    echo "usage: $0 {pull|push}"; exit 1;;
esac
