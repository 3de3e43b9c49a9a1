#!/bin/sh
# Launcher parity with the reference's train.sh (a one-line `python train.py
# --settings_file <yaml>` dispatch). The reference's own script points at
# config/ddd17_sup_only_recon.yaml, which does not exist in its tree; this one
# targets the synthetic sup_only smoke config so it runs out of the box —
# swap in any of the 36 configs under configs/ for real runs.
python train.py \
    --settings_file "${1:-configs/synthetic_sup_only.yaml}"
