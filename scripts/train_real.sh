#!/bin/bash
# Canonical training invocations for the 7 real captured scenes: camera-pose
# optimization on, black background, 1000-view limit (reference
# scripts/train_real.sh).  Fish additionally warms up geometry for 100k
# steps with hints zeroed.

python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/Cat/ --config.scene-name Cat --config.data.white-background False --config.data.view-num-limit 1000

# python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/CatSmall/ --config.scene-name CatSmall --config.data.white-background False --config.data.view-num-limit 1000
# python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/CupFabric/ --config.scene-name CupFabric --config.data.white-background False --config.data.view-num-limit 1000
# python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/Fish/ --config.scene-name Fish --config.data.white-background False --config.model.geometry-warmup-end 100000 --config.data.view-num-limit 1000
# python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/FurScene/ --config.scene-name FurScene --config.data.white-background False --config.data.view-num-limit 1000
# python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/Pikachu/ --config.scene-name Pikachu --config.data.white-background False --config.data.view-num-limit 1000
# python3 main.py config:nr-hints-cam-opt --config.data.path /path/to/data/Real/Pixiu/ --config.scene-name Pixiu --config.data.white-background False --config.data.view-num-limit 1000
