#!/bin/bash
# Evaluation-only runs for real scenes (test-time pose registration runs
# automatically because cam-opt is on).

python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/Cat/ --config.scene-name Cat --config.data.white-background False --config.data.view-num-limit 1000 --config.evaluation-only True
# ... same per-scene flags as train_real.sh with --config.evaluation-only True appended
