#!/usr/bin/env bash
# yesno vocoder recipe (8 kHz tiny CI fixture).
# Mirrors the stage flow of the reference egs/yesno/voc1/run.sh:42-162:
#   -1 download, 0 data prep, 1 feature extraction + stats + normalize,
#    2 training, 3 decoding. TPU-native: no run.pl / launcher — the train
#   CLI is data-parallel over all visible devices by itself.
set -euo pipefail

. ./cmd.sh

stage=-1
stop_stage=3
n_jobs=4
conf=conf/hifigan.v1.debug.yaml
tag=""
resume=""
use_fake_data=false   # synthesize wavs locally (zero-egress CI)
use_fake_segments=false

. ../../utils/parse_options.sh || exit 1

train_set="train_nodev"
dev_set="dev"
eval_set="eval"

set -u

db_root=downloads
dumpdir=dump

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
    echo "Stage -1: Data download"
    if [ "${use_fake_data}" = "true" ]; then
        python3 local/make_fake_data.py "${db_root}/waves_yesno"
    else
        mkdir -p "${db_root}"
        if [ ! -d "${db_root}/waves_yesno" ]; then
            (cd "${db_root}" \
             && curl -LO http://www.openslr.org/resources/1/waves_yesno.tar.gz \
             && tar xzf waves_yesno.tar.gz && rm waves_yesno.tar.gz)
        fi
    fi
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    python3 local/data_prep.py "${db_root}/waves_yesno" data \
        --use-fake-segments "${use_fake_segments}"
fi

stats_ext=h5
if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        [ ! -e "${dumpdir}/${name}/raw" ] && mkdir -p "${dumpdir}/${name}/raw"
        ../../utils/make_subset_data.sh "data/${name}" "${n_jobs}" "${dumpdir}/${name}/raw"
        seg_opt=""
        [ -e "${dumpdir}/${name}/raw/1/segments" ] && \
            seg_opt="--segments ${dumpdir}/${name}/raw/JOB/segments"
        # shellcheck disable=SC2086
        ${train_cmd} "JOB=1:${n_jobs}" "${dumpdir}/${name}/raw/preprocessing.JOB.log" \
            python3 -m parallelwavegan_tpu.bin.preprocess \
                --config "${conf}" \
                --wav-scp "${dumpdir}/${name}/raw/JOB/wav.scp" ${seg_opt} \
                --dumpdir "${dumpdir}/${name}/raw/dump.JOB" \
                --verbose 1
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
            --verbose 1
    done
fi

if [ -z "${tag}" ]; then
    expdir="exp/${train_set}_yesno_$(basename "${conf}" .yaml)"
else
    expdir="exp/${train_set}_yesno_${tag}"
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
    checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dumpdir}/${name}/norm" \
            --checkpoint "${checkpoint}" \
            --outdir "${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}" \
            --verbose 1
    done
fi
echo "Finished."
