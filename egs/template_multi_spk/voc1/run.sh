#!/usr/bin/env bash
# Template multi-speaker vocoder recipe: data prep must also emit
# data/<split>/utt2spk and data/spk2idx; preprocess then dumps a per-utt
# speaker id as the 'global' feature and compute-statistics can produce
# per-speaker stats. Stage flow otherwise matches template_single_spk.
set -euo pipefail

. ./cmd.sh

stage=0
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

set -u
db_root=downloads
dumpdir=dump

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    python3 local/data_prep.py "${db_root}" data   # must write utt2spk + spk2idx
fi

stats_ext=h5
if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        mkdir -p "${dumpdir}/${name}/raw"
        ../../utils/make_subset_data.sh "data/${name}" "${n_jobs}" "${dumpdir}/${name}/raw"
        ${train_cmd} "JOB=1:${n_jobs}" "${dumpdir}/${name}/raw/preprocessing.JOB.log" \
            python3 -m parallelwavegan_tpu.bin.preprocess \
                --config "${conf}" \
                --wav-scp "${dumpdir}/${name}/raw/JOB/wav.scp" \
                --utt2spk "data/${name}/utt2spk" \
                --spk2idx "data/spk2idx" \
                --dumpdir "${dumpdir}/${name}/raw/dump.JOB" \
                --verbose 0
    done
    python3 -m parallelwavegan_tpu.bin.compute_statistics \
        --config "${conf}" --rootdir "${dumpdir}/${train_set}/raw" \
        --dumpdir "${dumpdir}/${train_set}"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.normalize \
            --config "${conf}" --rootdir "${dumpdir}/${name}/raw" \
            --dumpdir "${dumpdir}/${name}/norm" \
            --stats "${dumpdir}/${train_set}/stats.${stats_ext}" --verbose 0
    done
fi

if [ -z "${tag}" ]; then
    expdir="exp/${train_set}_$(basename "${conf}" .yaml)"
else
    expdir="exp/${train_set}_${tag}"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Network training"
    mkdir -p "${expdir}"
    cp "${dumpdir}/${train_set}/stats.${stats_ext}" "${expdir}"
    resume_opt=""
    [ -n "${resume}" ] && resume_opt="--resume ${resume}"
    # shellcheck disable=SC2086
    ${cuda_cmd} "${expdir}/train.log" \
        python3 -m parallelwavegan_tpu.bin.train \
        --config "${conf}" \
        --train-dumpdir "${dumpdir}/${train_set}/norm" \
        --dev-dumpdir "${dumpdir}/${dev_set}/norm" \
        --outdir "${expdir}" ${resume_opt}
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Network decoding"
    [ -z "${checkpoint}" ] && \
        checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dumpdir}/${name}/norm" \
            --checkpoint "${checkpoint}" \
            --outdir "${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}"
    done
fi
echo "Finished."
