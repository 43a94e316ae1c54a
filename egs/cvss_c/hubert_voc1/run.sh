#!/usr/bin/env bash
# CVSS-C discrete-unit (HuBERT) vocoder recipe with duration prediction.
# Mirrors the reference egs/cvss_c/hubert_voc1 flow: discrete unit ids are
# dumped into the 'feats' slot by local/preprocess_hubert.py; the collater
# collapses consecutive duplicates into (code, duration) pairs for the
# duration-predicting generator.
set -euo pipefail

. ./cmd.sh

stage=0
stop_stage=3
n_jobs=8
conf=conf/hifigan_hubert_duration.v1.yaml
tag=""
resume=""
checkpoint=""
use_fake_data=false   # synthesize wavs + units locally (zero-egress CI)

. ../../utils/parse_options.sh || exit 1

train_set="train_nodev"
dev_set="dev"
eval_set="eval"

set -u
db_root=downloads   # expects CVSS-C audio + HuBERT unit files (see local/)
dumpdir=dump

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    if [ "${use_fake_data}" = "true" ]; then
        hop_size=$(awk '/^hop_size:/{print $2}' "${conf}")
        python3 local/make_fake_data.py "${db_root}" "${hop_size}"
        num_dev_opt="--num-dev 5 --num-eval 5"
    else
        num_dev_opt=""
    fi
    # expects <db_root>/wav/*.wav and <db_root>/units.txt ("utt u1 u2 ...")
    # shellcheck disable=SC2086
    python3 local/data_prep.py "${db_root}" data ${num_dev_opt}
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction (waves + discrete units)"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        mkdir -p "${dumpdir}/${name}/raw"
        python3 local/preprocess_hubert.py \
            --config "${conf}" \
            --wav-scp "data/${name}/wav.scp" \
            --units "${db_root}/units.txt" \
            --dumpdir "${dumpdir}/${name}/raw"
    done
fi

if [ -z "${tag}" ]; then
    expdir="exp/${train_set}_cvss_$(basename "${conf}" .yaml)"
else
    expdir="exp/${train_set}_cvss_${tag}"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Network training"
    mkdir -p "${expdir}"
    resume_opt=""
    [ -n "${resume}" ] && resume_opt="--resume ${resume}"
    # shellcheck disable=SC2086
    ${cuda_cmd} "${expdir}/train.log" \
        python3 -m parallelwavegan_tpu.bin.train \
        --config "${conf}" \
        --train-dumpdir "${dumpdir}/${train_set}/raw" \
        --dev-dumpdir "${dumpdir}/${dev_set}/raw" \
        --outdir "${expdir}" ${resume_opt}
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Network decoding"
    [ -z "${checkpoint}" ] && \
        checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dumpdir}/${name}/raw" \
            --checkpoint "${checkpoint}" \
            --outdir "${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}"
    done
fi
echo "Finished."
