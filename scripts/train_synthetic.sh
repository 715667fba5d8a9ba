#!/bin/bash
# Canonical training invocations for the 17 synthetic scenes.  Flag
# spellings are identical to the reference (iamNCJ/NRHints
# scripts/train_synthetic.sh) — swap /path/to/data for your dataset root.
# Uncomment the scene you want to train.

# Basket
python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Basket_PL_500/ --config.scene-name Basket --config.data.white-background True

# Layered Woven Ball (z-up, small init sphere)
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Complex_Ball_PL_500/ --config.scene-name Complex_Ball --config.data.white-background True --config.data.is-z-up True --config.model.sdf-network.init-bias 0.05

# Cup Plane family
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_Diffuse_PL_500/ --config.scene-name Cup_Plane_Diffuse --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_LongFur_PL_500/ --config.scene-name Cup_Plane_LongFur --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_ShortFur_PL_500/ --config.scene-name Cup_Plane_ShortFur --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_Metal_Aniso_PL_500/ --config.scene-name Cup_Plane_Metal_Aniso --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_Metal_PL_500/ --config.scene-name Cup_Plane_Metal --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_Metal_Rough_PL_500/ --config.scene-name Cup_Plane_Metal_Rough --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_Metal_VeryRough_PL_500/ --config.scene-name Cup_Plane_Metal_VeryRough --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_NonMetal_PL_500/ --config.scene-name Cup_Plane_NonMetal --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_NonMetal_Rough_PL_500/ --config.scene-name Cup_Plane_NonMetal_Rough --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_NonMetal_VeryRough_PL_500/ --config.scene-name Cup_Plane_NonMetal_VeryRough --config.data.white-background True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Cup_Plane_SSS_PL_500/ --config.scene-name Cup_Plane_SSS --config.data.white-background True

# Blender scenes (z-up)
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Drums_PL_500/ --config.scene-name Drums --config.data.white-background True --config.data.is-z-up True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Hotdog_PL_500/ --config.scene-name Hotdog --config.data.white-background True --config.data.is-z-up True
# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/Lego_PL_500/ --config.scene-name Lego --config.data.white-background True --config.data.is-z-up True

# python3 main.py config:nr-hints --config.data.path /path/to/data/Synthetic/FurBall_PL_500/ --config.scene-name FurBall --config.data.white-background True
