#!/bin/bash
# Copy DTU idrmasks into per-scan mask/%05d.png layout
# (reference copy_mask_dtu.sh).
set -e
idr="${1:?usage: copy_mask_dtu.sh <idrmasks_root> <dtu_root>}"
dtu="${2:?usage: copy_mask_dtu.sh <idrmasks_root> <dtu_root>}"

for scan in "$idr"/*; do
    name=$(basename "$scan")
    out="$dtu/$name/mask"
    mkdir -p "$out"
    n=0
    for f in "$scan"/*.png; do
        [ -e "$f" ] || continue
        cp "$f" "$(printf '%s/%05d.png' "$out" "$n")"
        n=$((n+1))
    done
    echo "$name: $n masks"
done
