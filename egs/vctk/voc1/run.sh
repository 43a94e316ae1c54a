#!/usr/bin/env bash
# VCTK vocoder recipe.
# Mirrors the reference egs/vctk/voc1/run.sh stage flow: -1 download,
# 0 data prep, 1 features + stats + normalize, 2 train, 3 decode,
# 4 objective evaluation (MCD + F0). TPU-native: the train CLI is
# data-parallel over all visible devices; no run.pl / launcher layer.
set -euo pipefail

. ./cmd.sh

stage=-1
stop_stage=4
n_jobs=8
conf=conf/parallel_wavegan.v1.yaml
tag=""
resume=""
checkpoint=""

. ../../utils/parse_options.sh || exit 1

train_set="train_nodev"
dev_set="dev"
eval_set="eval"
num_dev=250
num_eval=250

set -u

db_root=downloads
dumpdir=dump

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
    echo "Stage -1: Data download"
    mkdir -p "${db_root}"
    if [ ! -d "${db_root}/vctk" ]; then
        echo "Please download the vctk corpus and extract it to ${db_root}/vctk."
        exit 1
    fi
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    python3 local/data_prep.py "${db_root}/vctk" data \
        --num-dev "${num_dev}" --num-eval "${num_eval}"
fi

stats_ext=h5
if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        [ ! -e "${dumpdir}/${name}/raw" ] && mkdir -p "${dumpdir}/${name}/raw"
        ../../utils/make_subset_data.sh "data/${name}" "${n_jobs}" "${dumpdir}/${name}/raw"
        ${train_cmd} "JOB=1:${n_jobs}" "${dumpdir}/${name}/raw/preprocessing.JOB.log" \
            python3 -m parallelwavegan_tpu.bin.preprocess \
                --config "${conf}" \
                --wav-scp "${dumpdir}/${name}/raw/JOB/wav.scp" \
                --dumpdir "${dumpdir}/${name}/raw/dump.JOB" \
                --verbose 0
    done
    echo "Stage 1b: Statistics computation"
    python3 -m parallelwavegan_tpu.bin.compute_statistics \
        --config "${conf}" \
        --rootdir "${dumpdir}/${train_set}/raw" \
        --dumpdir "${dumpdir}/${train_set}" \
        --verbose 1
    echo "Stage 1c: Normalization"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.normalize \
            --config "${conf}" \
            --rootdir "${dumpdir}/${name}/raw" \
            --dumpdir "${dumpdir}/${name}/norm" \
            --stats "${dumpdir}/${train_set}/stats.${stats_ext}" \
            --verbose 0
    done
fi

if [ -z "${tag}" ]; then
    expdir="exp/${train_set}_vctk_$(basename "${conf}" .yaml)"
else
    expdir="exp/${train_set}_vctk_${tag}"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Network training"
    [ ! -e "${expdir}" ] && mkdir -p "${expdir}"
    cp "${dumpdir}/${train_set}/stats.${stats_ext}" "${expdir}"
    resume_opt=""
    [ -n "${resume}" ] && resume_opt="--resume ${resume}"
    # shellcheck disable=SC2086
    ${cuda_cmd} "${expdir}/train.log" \
        python3 -m parallelwavegan_tpu.bin.train \
        --config "${conf}" \
        --train-dumpdir "${dumpdir}/${train_set}/norm" \
        --dev-dumpdir "${dumpdir}/${dev_set}/norm" \
        --outdir "${expdir}" ${resume_opt} \
        --verbose 1
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Network decoding"
    [ -z "${checkpoint}" ] && \
        checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dumpdir}/${name}/norm" \
            --checkpoint "${checkpoint}" \
            --outdir "${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}" \
            --verbose 1
    done
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "Stage 4: Objective evaluation"
    [ -z "${checkpoint}" ] && \
        checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        wavdir="${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}"
        python3 -m parallelwavegan_tpu.bin.evaluate_mcd \
            --wavdir "${wavdir}" \
            --gt-wavdir "${db_root}/vctk/wavs" \
            --outdir "${wavdir}/eval" --n_jobs "${n_jobs}"
        python3 -m parallelwavegan_tpu.bin.evaluate_f0 \
            --wavdir "${wavdir}" \
            --gt-wavdir "${db_root}/vctk/wavs" \
            --outdir "${wavdir}/eval" --n_jobs "${n_jobs}"
    done
fi
echo "Finished."
