#!/usr/bin/env python3
"""Ofuton-P data prep: <song>/<song>.wav + <song>.lab pairs.

Behavioral reference: /root/reference/egs/ofuton_p_utagoe_db/voc1/local/dataset_split.py
(song-level train/dev/eval split; segments are derived afterwards by
egs/utils/prep_singing_segments.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "..", "utils"))
from singing_data_prep import prepare  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("db_root")
    parser.add_argument("data_dir")
    parser.add_argument("--fs", type=int, default=24000,
                        help="resample target (must match conf sampling_rate)")
    args = parser.parse_args()
    import os as _os
    prepare(
        args.db_root, args.data_dir, prefix="ofuton", spk="ofuton",
        wav_glob="*/*.wav",
        label_for=lambda w: w[:-4] + ".lab",
        song_id=lambda w: _os.path.basename(_os.path.dirname(w)),
        dev_songs=["chatsumi", "my_grandfathers_clock_3_2", "haruyo_koi",
                   "momiji", "tetsudou_shouka"],
        eval_songs=["usagito_kame", "my_grandfathers_clock_1_2",
                    "antagata_dokosa", "momotarou", "furusato"],
        resample_to=args.fs,
    )


if __name__ == "__main__":
    main()
