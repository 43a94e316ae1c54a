#!/usr/bin/env python3
"""PJS data prep: pjs<NN>/pjs<NN>_song.wav + .lab (song subset).

Behavioral reference: /root/reference/egs/pjs/voc1/local/dataset_split.py
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
        args.db_root, args.data_dir, prefix="pjs", spk="pjs",
        wav_glob="pjs*/pjs*_song.wav",
        label_for=lambda w: w[:-4] + ".lab",
        song_id=lambda w: _os.path.basename(_os.path.dirname(w)),
        dev_songs=["pjs002", "pjs012", "pjs0012", "pjs022", "pjs032",
                   "pjs042", "pjs052", "pjs062", "pjs072", "pjs082",
                   "pjs092"],
        eval_songs=["pjs007", "pjs017", "pjs027", "pjs037", "pjs047",
                    "pjs057", "pjs067", "pjs077", "pjs087", "pjs097"],
        resample_to=args.fs,
    )


if __name__ == "__main__":
    main()
