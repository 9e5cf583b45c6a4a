#!/bin/bash
# Reference-default-budget AutoML demonstration (VERDICT round-4 item 4):
# 200 sampled configs x 1 seed low-fidelity on physprop_perturb (CPU
# trial slots), then top-3 x 2 seeds @ 40 epochs high fidelity, blend +
# ensemble PASP (the solver runs PASP automatically for this dataset).
#
# On the 2-core round-5 host this takes several hours wall-clock with 2
# trial slots; the solver records progress incrementally in
# $WORK/log_physprop_perturb/solver_log.txt and every trial's log dir,
# so partial runs are inspectable and the search phase is restartable
# by rerunning (dedup'd config ids make reruns sample fresh configs).
#
# Harvest when complete:
#   tail -5 $WORK/log_physprop_perturb/solver_log.txt   # blend + PASP
#   ls $WORK/log_physprop_perturb/*seed*/ | wc -l       # trial count
#   column -s, -t $WORK/log_physprop_perturb/search_result.csv | head
set -u
WORK=${1:-/root/glam_automl_200}
mkdir -p "$WORK"
cd "$(dirname "$0")/.."
GLAM_TPU_TRIAL_SLOTS=2 exec python -m glam_tpu.glam \
    --dataset physprop_perturb --dataset_root datasets/physprop \
    --n_init_configs 200 --n_low_fidelity_seed 1 --low_fidelity_epochs 2 \
    --n_top_blend 3 --n_high_fidelity_seed 2 --high_fidelity_epochs 40 \
    --platform cpu --work_dir "$WORK"
