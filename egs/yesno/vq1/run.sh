#!/usr/bin/env bash
# yesno VQ-VAE wav2wav recipe (tiny CI fixture; mirrors egs/vctk/vq1 flow
# without conditioning: preprocess --skip-mel-ext, train on raw waves).
set -euo pipefail

. ./cmd.sh

stage=-1
stop_stage=3
n_jobs=4
conf=conf/vqvae.v1.debug.yaml
tag=""
resume=""
use_fake_data=false

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
        python3 ../voc1/local/make_fake_data.py "${db_root}/waves_yesno"
    else
        mkdir -p "${db_root}"
        [ ! -d "${db_root}/waves_yesno" ] && (cd "${db_root}" \
            && curl -LO http://www.openslr.org/resources/1/waves_yesno.tar.gz \
            && tar xzf waves_yesno.tar.gz && rm waves_yesno.tar.gz)
    fi
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation"
    python3 ../voc1/local/data_prep.py "${db_root}/waves_yesno" data \
        --use-fake-segments false
fi

use_local_condition="$(python3 -c "import yaml; print(str(yaml.safe_load(open('${conf}')).get('use_local_condition', False)).lower())")"

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction (waves only)"
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
                --dumpdir "${dumpdir}/${name}/raw/dump.JOB" \
                --skip-mel-ext ${extra_opts} --verbose 0
    done

    if [ "${use_local_condition}" = "true" ]; then
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
    expdir="exp/${train_set}_yesno_$(basename "${conf}" .yaml)"
else
    expdir="exp/${train_set}_yesno_${tag}"
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
    echo "Stage 3: Network decoding (analysis-by-synthesis + symbols)"
    checkpoint="$(ls -t "${expdir}"/checkpoint-*.pkl 2>/dev/null | head -1)"
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m parallelwavegan_tpu.bin.decode \
            --dumpdir "${dumpdir}/${name}/${featdir_suffix}" \
            --checkpoint "${checkpoint}" \
            --outdir "${expdir}/wav/$(basename "${checkpoint}" .pkl)/${name}"
    done
fi
echo "Finished."
