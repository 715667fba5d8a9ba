#!/bin/bash
# Dataset download: same 7 real + 17 synthetic scenes as the reference
# (iamNCJ/NRHints scripts/download_data.sh), hosted by the NRHints authors.
set -e
DATA_DIR=${DATA_DIR:-./training_data}
BASE=https://igwebhost.azurewebsites.net/NRHints/Data

fetch() {  # fetch <split> <name>
  mkdir -p "$DATA_DIR/$1"
  wget "$BASE/$1/$2.zip" -O "$DATA_DIR/$1/$2.zip" -q --show-progress
  unzip -q "$DATA_DIR/$1/$2.zip" -d "$DATA_DIR/$1"
}

for s in Cat FurScene Pixiu Fish CatSmall CupFabric; do fetch Real "$s"; done
# Pikachu ships as a split archive.
mkdir -p "$DATA_DIR/Real"
wget "$BASE/Real/Pikachu.zip.001" -O "$DATA_DIR/Real/Pikachu.zip.001" -q --show-progress
wget "$BASE/Real/Pikachu.zip.002" -O "$DATA_DIR/Real/Pikachu.zip.002" -q --show-progress
cat "$DATA_DIR"/Real/Pikachu.zip.* > "$DATA_DIR/Real/Pikachu.zip"
rm -f "$DATA_DIR"/Real/Pikachu.zip.00*
unzip -q "$DATA_DIR/Real/Pikachu.zip" -d "$DATA_DIR/Real"

for s in Cup_Plane_Diffuse_PL_500 Cup_Plane_Metal_PL_500 Cup_Plane_Metal_Rough_PL_500 \
         Cup_Plane_Metal_VeryRough_PL_500 Cup_Plane_Metal_Aniso_PL_500 \
         Cup_Plane_NonMetal_PL_500 Cup_Plane_NonMetal_Rough_PL_500 \
         Cup_Plane_NonMetal_VeryRough_PL_500 Cup_Plane_ShortFur_PL_500 \
         Cup_Plane_LongFur_PL_500 Cup_Plane_SSS_PL_500 FurBall_PL_500 \
         Basket_PL_500 Complex_Ball_PL_500 Drums_PL_500 Hotdog_PL_500 Lego_PL_500; do
  fetch Synthetic "$s"
done
