#!/usr/bin/env bash
# jpg frame sequence -> mp4 (reference scripts/make_video.sh).
# usage: make_video.sh <frames_dir> <out.mp4>
set -euo pipefail
ffmpeg -framerate 30 -pattern_type glob -i "$1/*.jpg" \
  -c:v libx264 -pix_fmt yuv420p "$2"
