"""Training: score-matching loss, on-device noise transform, train state with
EMA + plateau LR control, and the (mesh-shardable) train step."""
