#!/bin/bash
# Evaluation-only runs for synthetic scenes (add --config.ckpt-path to pick
# a specific checkpoint; by default the newest in the run dir is used).

python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_Diffuse_PL_500/ --config.scene-name Cup_Plane_Diffuse --config.data.white-background True --config.evaluation-only True
# ... same per-scene flags as train_synthetic.sh with --config.evaluation-only True appended
