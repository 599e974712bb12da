#!/usr/bin/env bash
# Batch render driver: swap both identities' videos through one checkpoint.
# Equivalent of the reference's script-tool batch driver (SURVEY.md §2 #17),
# expressed over the d3f-tpu CLI.
#
# Usage: scripts/render_videos.sh <video_a> <video_b> <checkpoint_dir> [size]
set -euo pipefail

VIDEO_A=${1:?video for identity a}
VIDEO_B=${2:?video for identity b}
CHECKPOINT=${3:?checkpoint directory}
SIZE=${4:-448}

python -m denoising_diffusion_deep_fake_tpu.main video swap \
    "$VIDEO_A" "$CHECKPOINT" a --width "$SIZE" --height "$SIZE"
python -m denoising_diffusion_deep_fake_tpu.main video swap \
    "$VIDEO_B" "$CHECKPOINT" b --width "$SIZE" --height "$SIZE"
