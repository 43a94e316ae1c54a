#!/usr/bin/env bash
# VCTK discrete-unit (HuBERT) vocoder recipe, multi-speaker.
# Mirrors the reference egs/vctk/hubert_voc1 flow: discrete unit ids are
# dumped into the 'feats' slot (speaker index in a second column for the
# spk-embedding generators) by local/preprocess_hubert.py.
set -euo pipefail

. ./cmd.sh

stage=0
stop_stage=3
conf=conf/hifigan_hubert.v1.yaml
tag=""
resume=""
checkpoint=""

. ../../utils/parse_options.sh || exit 1

train_set="train_nodev"
dev_set="dev"
eval_set="eval"

set -u
db_root=downloads   # expects VCTK wav48/ + HuBERT unit file (units.txt)
dumpdir=dump

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    # units.txt: "utt_id u1 u2 u3 ..." (e.g. from a HuBERT k-means model)
    python3 local/data_prep.py "${db_root}/vctk" data
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction (waves + discrete units + spk ids)"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        mkdir -p "${dumpdir}/${name}/raw"
        python3 local/preprocess_hubert.py \
            --config "${conf}" \
            --wav-scp "data/${name}/wav.scp" \
            --units "${db_root}/units.txt" \
            --utt2spk "data/${name}/utt2spk" \
            --spk2idx "data/spk2idx" \
            --dumpdir "${dumpdir}/${name}/raw"
    done
fi

if [ -z "${tag}" ]; then
    expdir="exp/${train_set}_vctk_$(basename "${conf}" .yaml)"
else
    expdir="exp/${train_set}_vctk_${tag}"
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
        --outdir "${expdir}" ${resume_opt} \
        --verbose 1
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Network decoding"
    [ -z "${checkpoint}" ] && \
        checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dumpdir}/${name}/raw" \
            --checkpoint "${checkpoint}" \
            --outdir "${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}" \
            --verbose 1
    done
fi
echo "Finished."
