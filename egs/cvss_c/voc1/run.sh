#!/usr/bin/env bash
# CVSS-C vocoder recipe (speech-to-speech-translation target speech).
# Mirrors the reference egs/cvss_c/voc1/run.sh stage flow
# (/root/reference/egs/cvss_c/voc1/run.sh): 0 data prep, 1 features +
# stats + normalize, 2 train, 3 decode. TPU-native: the train CLI is
# data-parallel over all visible devices; job dispatch goes through
# ${train_cmd} (cmd.sh -> egs/utils/run_jobs.py, run.pl/slurm.pl roles).
# The reference's --pretrain flow (reuse another corpus' stats +
# checkpoint) is supported via --pretrain.
set -euo pipefail

. ./cmd.sh

stage=0
stop_stage=3
n_jobs=4
conf=conf/hifigan.v1.yaml
tag=""
resume=""
pretrain=""        # checkpoint path to warm-start from (skips stats)
checkpoint=""
use_fake_data=false  # synthesize a tiny corpus locally (zero-egress CI)

# directory containing train/ dev/ test/ subdirs of uniquely-named wavs
# (MODIFY BY YOURSELF, e.g. /path/to/cvss/es_en-c)
db_root=downloads

. ../../utils/parse_options.sh || exit 1

train_set="train"
dev_set="dev"
eval_set="test"

set -u
dumpdir=dump

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    if [ "${use_fake_data}" = "true" ]; then
        fs=$(awk '/^sampling_rate:/{print $2}' "${conf}")
        python3 local/make_fake_data.py "${db_root}" "${fs}"
    fi
    python3 local/data_prep.py "${db_root}" data
fi

stats_ext=h5
if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        [ ! -e "${dumpdir}/${name}/raw" ] && mkdir -p "${dumpdir}/${name}/raw"
        ../../utils/make_subset_data.sh "data/${name}" "${n_jobs}" "${dumpdir}/${name}/raw"
        # shellcheck disable=SC2086
        ${train_cmd} "JOB=1:${n_jobs}" "${dumpdir}/${name}/raw/preprocessing.JOB.log" \
            python3 -m parallelwavegan_tpu.bin.preprocess \
                --config "${conf}" \
                --wav-scp "${dumpdir}/${name}/raw/JOB/wav.scp" \
                --dumpdir "${dumpdir}/${name}/raw/dump.JOB" \
                --verbose 0
    done
    if [ -z "${pretrain}" ]; then
        echo "Stage 1b: Statistics computation"
        python3 -m parallelwavegan_tpu.bin.compute_statistics \
            --config "${conf}" \
            --rootdir "${dumpdir}/${train_set}/raw" \
            --dumpdir "${dumpdir}/${train_set}" \
            --verbose 1
    else
        echo "Use statistics of pretrained model. Skip statistics computation."
        cp "$(dirname "${pretrain}")/stats.${stats_ext}" "${dumpdir}/${train_set}"
    fi
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
    expdir="exp/${train_set}_cvss_$(basename "${conf}" .yaml)"
    if [ -n "${pretrain}" ]; then
        expdir+="_$(basename "$(dirname "${pretrain}")")"
    fi
else
    expdir="exp/${train_set}_cvss_${tag}"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Network training"
    [ ! -e "${expdir}" ] && mkdir -p "${expdir}"
    cp "${dumpdir}/${train_set}/stats.${stats_ext}" "${expdir}"
    resume_opt=""
    [ -n "${resume}" ] && resume_opt="--resume ${resume}"
    pretrain_opt=""
    [ -n "${pretrain}" ] && pretrain_opt="--pretrain ${pretrain}"
    # shellcheck disable=SC2086
    ${cuda_cmd} "${expdir}/train.log" \
        python3 -m parallelwavegan_tpu.bin.train \
        --config "${conf}" \
        --train-dumpdir "${dumpdir}/${train_set}/norm" \
        --dev-dumpdir "${dumpdir}/${dev_set}/norm" \
        --outdir "${expdir}" ${resume_opt} ${pretrain_opt} \
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
echo "Finished."
