#!/usr/bin/env bash
# Split a data dir's wav.scp (or segments) into n subsets.
# Equivalent role to the reference's utils/make_subset_data.sh: without
# segments the split is over wav.scp utterances; with segments the split is
# over segment utterances and each shard's wav.scp keeps the recordings its
# segments reference.
set -euo pipefail

if [ $# -ne 3 ]; then
  echo "Usage: $0 <src-data-dir> <num-split> <dst-dir>"
  exit 1
fi

src=$1
n=$2
dst=$3
mkdir -p "${dst}"
for i in $(seq 1 "${n}"); do mkdir -p "${dst}/${i}"; done

if [ -e "${src}/segments" ]; then
  outs=""
  for i in $(seq 1 "${n}"); do outs="${outs} ${dst}/${i}/segments"; done
  # shellcheck disable=SC2086
  python3 "$(dirname "$0")/split_scp.py" "${src}/segments" ${outs}
  for i in $(seq 1 "${n}"); do
    awk 'NR==FNR {rec[$2]=1; next} rec[$1]' \
      "${dst}/${i}/segments" "${src}/wav.scp" > "${dst}/${i}/wav.scp"
  done
else
  outs=""
  for i in $(seq 1 "${n}"); do outs="${outs} ${dst}/${i}/wav.scp"; done
  # shellcheck disable=SC2086
  python3 "$(dirname "$0")/split_scp.py" "${src}/wav.scp" ${outs}
fi
echo "Successfully split ${src} into ${n} subsets in ${dst}."
