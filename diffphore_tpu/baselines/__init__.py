"""Baseline-comparison drivers (pharmacophore aligners, docking, target
fishing).  These orchestrate EXTERNAL binaries (AncPhore/pharao/pharmer,
vina-family, IFPTarget) exactly like the reference's src/baselines; binaries
absent from an environment produce clean skips, while the pure-logic pieces
(random phore generation, conformer generation, SDF splitting, performance
tables) run natively."""
