#!/usr/bin/env bash
# VCTK VQ-VAE wav2wav recipe with speaker-id global conditioning.
# Mirrors the reference egs/vctk/vq1/run.sh flow: waves only (+speaker ids)
# in stage 1 (--skip-mel-ext), VQ training in stage 2, analysis-by-synthesis
# decode with discrete-symbol dump in stage 3.
set -euo pipefail

. ./cmd.sh

stage=-1
stop_stage=3
n_jobs=8
conf=conf/conditioned_melgan_vae.v3.yaml
tag=""
resume=""
checkpoint=""

. ../../utils/parse_options.sh || exit 1

train_set="train_nodev"
dev_set="dev"
eval_set="eval"

set -u
db_root=downloads/VCTK-Corpus
dumpdir=dump

if [ "${stage}" -le -1 ] && [ "${stop_stage}" -ge -1 ]; then
    echo "Stage -1: Data download"
    mkdir -p downloads
    [ ! -d "${db_root}" ] && {
        echo "Download VCTK-Corpus (https://datashare.ed.ac.uk/handle/10283/3443)"
        echo "and extract it to ${db_root}."; exit 1; }
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    python3 local/data_prep.py "${db_root}" data
fi

use_local_condition="$(python3 -c "import yaml; print(str(yaml.safe_load(open('${conf}')).get('use_local_condition', False)).lower())")"

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction (waves + speaker ids)"
    extra_opts=""
    [ "${use_local_condition}" = "true" ] && extra_opts="--extract-f0"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        mkdir -p "${dumpdir}/${name}/raw"
        ../../utils/make_subset_data.sh "data/${name}" "${n_jobs}" "${dumpdir}/${name}/raw"
        # shellcheck disable=SC2086
        ${train_cmd} "JOB=1:${n_jobs}" "${dumpdir}/${name}/raw/preprocessing.JOB.log" \
            python3 -m parallelwavegan_tpu.bin.preprocess \
                --config "${conf}" \
                --wav-scp "${dumpdir}/${name}/raw/JOB/wav.scp" \
                --utt2spk "data/${name}/utt2spk" \
                --spk2idx "data/spk2idx" \
                --dumpdir "${dumpdir}/${name}/raw/dump.JOB" \
                --skip-mel-ext ${extra_opts} --verbose 0
    done

    if [ "${use_local_condition}" = "true" ]; then
        # normalize the continuous log-F0 channel (reference
        # egs/vctk/vq1/run.sh:117-150: stats + normalize --target-feats local)
        echo "Stage 1b: Local-feature statistics + normalization"
        python3 -m parallelwavegan_tpu.bin.compute_statistics \
            --config "${conf}" \
            --rootdir "${dumpdir}/${train_set}/raw" \
            --dumpdir "${dumpdir}/${train_set}" \
            --target-feats local --verbose 0
        for name in "${train_set}" "${dev_set}" "${eval_set}"; do
            ${train_cmd} "JOB=1:${n_jobs}" "${dumpdir}/${name}/norm/normalize.JOB.log" \
                python3 -m parallelwavegan_tpu.bin.normalize \
                    --config "${conf}" \
                    --stats "${dumpdir}/${train_set}/stats.h5" \
                    --rootdir "${dumpdir}/${name}/raw/dump.JOB" \
                    --dumpdir "${dumpdir}/${name}/norm/dump.JOB" \
                    --target-feats local --verbose 0
        done
    fi
fi

featdir_suffix="raw"
[ "${use_local_condition}" = "true" ] && featdir_suffix="norm"

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
        --train-dumpdir "${dumpdir}/${train_set}/${featdir_suffix}" \
        --dev-dumpdir "${dumpdir}/${dev_set}/${featdir_suffix}" \
        --outdir "${expdir}" ${resume_opt}
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Network decoding"
    [ -z "${checkpoint}" ] && \
        checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dumpdir}/${name}/${featdir_suffix}" \
            --checkpoint "${checkpoint}" \
            --outdir "${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}"
    done
fi
echo "Finished."
