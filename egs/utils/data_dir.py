#!/usr/bin/env python3
"""Kaldi-style data-dir utilities: validate / fix / combine / subset / maps.

Role equivalents of the reference's /root/reference/utils/{validate,fix,
combine,subset}_data_dir.sh and utt2spk_to_spk2utt.pl (behavioral parity,
single python entry point):

    data_dir.py validate <dir>            # check consistency, sortedness
    data_dir.py fix <dir>                 # sort + intersect utt lists
    data_dir.py combine <dst> <src>...    # concatenate data dirs
    data_dir.py subset <src> <dst> --first N | --last N | --utt-list F
    data_dir.py utt2spk-to-spk2utt <dir>  # write spk2utt from utt2spk
    data_dir.py spk2utt-to-utt2spk <dir>  # write utt2spk from spk2utt
    data_dir.py apply-map <map> [-f N]    # apply_map.pl: stdin field N -> map
    data_dir.py filter-scp <ids> [-f N] [--exclude]   # filter_scp.pl
    data_dir.py utt2dur <dir>             # get_utt2dur.sh: write utt2dur
    data_dir.py split-data <dir> <N>      # split_data.sh: dir/split<N>/<i>
    data_dir.py resample <src> <dst> --fs FS [--wav-outdir D]
                                          # resample_data_dir.sh: really
                                          # resamples the audio (polyphase)

(get_utt2dur/resample need the parallelwavegan_tpu package importable —
recipes install it editable.)
"""

import argparse
import os
import sys

FILES = ["wav.scp", "utt2spk", "segments", "label"]


def read_map(path):
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split(None, 1)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def write_map(path, m):
    with open(path, "w") as f:
        for k in sorted(m):
            f.write(f"{k} {m[k]}\n".rstrip() + "\n")


def utt_ids(d):
    """The utterance key set: segments' if present, else wav.scp's."""
    seg = os.path.join(d, "segments")
    if os.path.exists(seg):
        return set(read_map(seg))
    return set(read_map(os.path.join(d, "wav.scp")))


def cmd_validate(args):
    d = args.dir
    errors = []
    wav = os.path.join(d, "wav.scp")
    if not os.path.exists(wav):
        errors.append("missing wav.scp")
    else:
        recs = read_map(wav)
        if not recs:
            errors.append("empty wav.scp")
        for utt, path in recs.items():
            if len(path.split()) == 1 and not os.path.exists(path):
                errors.append(f"wav.scp: missing file for {utt}: {path}")
                if len(errors) > 20:
                    break
        seg = os.path.join(d, "segments")
        if os.path.exists(seg):
            for utt, rest in read_map(seg).items():
                parts = rest.split()
                if len(parts) != 3:
                    errors.append(f"segments: malformed line for {utt}")
                    continue
                rec, start, end = parts
                if rec not in recs:
                    errors.append(f"segments: unknown recording {rec}")
                if float(end) <= float(start):
                    errors.append(f"segments: empty span for {utt}")
        u2s = os.path.join(d, "utt2spk")
        if os.path.exists(u2s):
            utts = utt_ids(d)
            m = read_map(u2s)
            extra = set(m) - utts
            missing = utts - set(m)
            if extra:
                errors.append(f"utt2spk: {len(extra)} utts not in data "
                              f"(e.g. {sorted(extra)[:3]})")
            if missing:
                errors.append(f"utt2spk: {len(missing)} utts missing "
                              f"(e.g. {sorted(missing)[:3]})")
    if errors:
        for e in errors:
            print(f"ERROR: {e}", file=sys.stderr)
        sys.exit(1)
    print(f"{d}: ok")


def cmd_fix(args):
    d = args.dir
    utts = utt_ids(d)
    u2s = os.path.join(d, "utt2spk")
    if os.path.exists(u2s):
        utts &= set(read_map(u2s))
    seg_path = os.path.join(d, "segments")
    kept_recs = None
    if os.path.exists(seg_path):
        segs = {k: v for k, v in read_map(seg_path).items() if k in utts}
        write_map(seg_path, segs)
        kept_recs = {v.split()[0] for v in segs.values()}
    for name in ["utt2spk", "label"]:
        p = os.path.join(d, name)
        if os.path.exists(p):
            keys = kept_recs if name == "label" and kept_recs else utts
            write_map(p, {k: v for k, v in read_map(p).items() if k in keys})
    wav_path = os.path.join(d, "wav.scp")
    wavs = read_map(wav_path)
    keep = kept_recs if kept_recs is not None else utts
    write_map(wav_path, {k: v for k, v in wavs.items() if k in keep})
    print(f"fixed {d}: {len(utts)} utts")


def cmd_combine(args):
    os.makedirs(args.dst, exist_ok=True)
    for name in FILES:
        merged = {}
        found = False
        for src in args.srcs:
            p = os.path.join(src, name)
            if os.path.exists(p):
                found = True
                for k, v in read_map(p).items():
                    if k in merged and merged[k] != v:
                        sys.exit(f"conflicting entry {k} in {name}")
                    merged[k] = v
        if found:
            write_map(os.path.join(args.dst, name), merged)
    print(f"combined {len(args.srcs)} dirs into {args.dst}")


def cmd_subset(args):
    utts = sorted(utt_ids(args.src))
    if args.first:
        keep = set(utts[: args.first])
    elif args.last:
        keep = set(utts[-args.last:])
    else:
        with open(args.utt_list) as f:
            keep = {line.split()[0] for line in f if line.strip()}
    os.makedirs(args.dst, exist_ok=True)
    seg_path = os.path.join(args.src, "segments")
    kept_recs = None
    if os.path.exists(seg_path):
        segs = {k: v for k, v in read_map(seg_path).items() if k in keep}
        write_map(os.path.join(args.dst, "segments"), segs)
        kept_recs = {v.split()[0] for v in segs.values()}
    for name in ["wav.scp", "utt2spk", "label"]:
        p = os.path.join(args.src, name)
        if not os.path.exists(p):
            continue
        keys = keep if kept_recs is None or name == "utt2spk" else kept_recs
        write_map(os.path.join(args.dst, name),
                  {k: v for k, v in read_map(p).items() if k in keys})
    print(f"subset {args.dst}: {len(keep)} utts")


def cmd_u2s(args):
    m = read_map(os.path.join(args.dir, "utt2spk"))
    spk2utt = {}
    for utt, spk in m.items():
        spk2utt.setdefault(spk, []).append(utt)
    write_map(os.path.join(args.dir, "spk2utt"),
              {s: " ".join(sorted(us)) for s, us in spk2utt.items()})
    print(f"wrote spk2utt ({len(spk2utt)} speakers)")


def cmd_s2u(args):
    m = read_map(os.path.join(args.dir, "spk2utt"))
    utt2spk = {}
    for spk, utts in m.items():
        for utt in utts.split():
            utt2spk[utt] = spk
    write_map(os.path.join(args.dir, "utt2spk"), utt2spk)
    print(f"wrote utt2spk ({len(utt2spk)} utts)")


def cmd_apply_map(args):
    """apply_map.pl: replace stdin's field N through a key->value map."""
    m = read_map(args.map)
    f = args.field - 1
    for line in sys.stdin:
        parts = line.rstrip("\n").split()
        if len(parts) <= f:
            sys.exit(f"apply-map: line has no field {args.field}: {line!r}")
        key = parts[f]
        if key not in m:
            if args.permissive:
                continue
            sys.exit(f"apply-map: no map entry for {key!r}")
        parts[f] = m[key]
        print(" ".join(parts))


def cmd_filter_scp(args):
    """filter_scp.pl: keep (or --exclude) stdin lines whose field N key is
    in the id-list file (first field per line of the list)."""
    with open(args.ids) as fh:
        ids = {line.split()[0] for line in fh if line.strip()}
    f = args.field - 1
    for line in sys.stdin:
        parts = line.split()
        if len(parts) <= f:
            continue
        if (parts[f] in ids) != args.exclude:
            sys.stdout.write(line)


def cmd_utt2dur(args):
    """get_utt2dur.sh: write <dir>/utt2dur (seconds) from wav.scp
    (+segments when present)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", ".."))
    from parallelwavegan_tpu.utils.io import read_wav

    d = args.dir
    seg_path = os.path.join(d, "segments")
    out = {}
    if os.path.exists(seg_path):
        # durations come from the segment spans: no need to decode audio
        for utt, rest in read_map(seg_path).items():
            _, start, end = rest.split()
            out[utt] = f"{float(end) - float(start):.3f}"
    else:
        for rec, path in read_map(os.path.join(d, "wav.scp")).items():
            fs, data = read_wav(path)
            out[rec] = f"{len(data) / fs:.3f}"
    write_map(os.path.join(d, "utt2dur"), out)
    print(f"wrote utt2dur ({len(out)} utts)")


def cmd_split_data(args):
    """split_data.sh: write <dir>/split<N>/<i>/{wav.scp,utt2spk,segments}
    with utterances round-robined in sorted order (contiguous blocks,
    like the reference's utt2spk-respecting split for spk-less dirs)."""
    d, n = args.dir, args.n
    utts = sorted(utt_ids(d))
    per = -(-len(utts) // n)
    blocks = [set(utts[i * per:(i + 1) * per]) for i in range(n)]
    seg_path = os.path.join(d, "segments")
    segs = read_map(seg_path) if os.path.exists(seg_path) else None
    for i, block in enumerate(blocks, 1):
        sub = os.path.join(d, f"split{n}", str(i))
        os.makedirs(sub, exist_ok=True)
        kept_recs = None
        if segs is not None:
            bseg = {k: v for k, v in segs.items() if k in block}
            write_map(os.path.join(sub, "segments"), bseg)
            kept_recs = {v.split()[0] for v in bseg.values()}
        for name in ["wav.scp", "utt2spk", "label"]:
            p = os.path.join(d, name)
            if not os.path.exists(p):
                continue
            keys = (kept_recs if kept_recs is not None
                    and name != "utt2spk" else block)
            write_map(os.path.join(sub, name),
                      {k: v for k, v in read_map(p).items() if k in keys})
    print(f"split {d} into {n} ({per} utts each)")


def cmd_resample(args):
    """resample_data_dir.sh role: actually resample every wav
    (scipy polyphase — the same filter preprocess uses) into
    --wav-outdir and write <dst> pointing at the new files."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", ".."))
    from parallelwavegan_tpu.bin.preprocess import resample_poly_np
    from parallelwavegan_tpu.utils.io import read_wav, write_wav

    wav_outdir = args.wav_outdir or os.path.join(args.dst, "wavs")
    os.makedirs(wav_outdir, exist_ok=True)
    os.makedirs(args.dst, exist_ok=True)
    recs = read_map(os.path.join(args.src, "wav.scp"))
    new = {}
    for rec, path in recs.items():
        # read_wav normalizes integer PCM to float32 in [-1, 1) already
        fs, data = read_wav(path)
        if fs != args.fs:
            data = resample_poly_np(data, fs, args.fs)
        outp = os.path.abspath(os.path.join(wav_outdir, f"{rec}.wav"))
        write_wav(outp, args.fs, data)
        new[rec] = outp
    write_map(os.path.join(args.dst, "wav.scp"), new)
    for name in ["utt2spk", "segments", "label"]:
        p = os.path.join(args.src, name)
        if os.path.exists(p):
            write_map(os.path.join(args.dst, name), read_map(p))
    print(f"resampled {len(new)} wavs to {args.fs} Hz -> {args.dst}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("validate")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_validate)
    sp = sub.add_parser("fix")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_fix)
    sp = sub.add_parser("combine")
    sp.add_argument("dst")
    sp.add_argument("srcs", nargs="+")
    sp.set_defaults(fn=cmd_combine)
    sp = sub.add_parser("subset")
    sp.add_argument("src")
    sp.add_argument("dst")
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--first", type=int)
    g.add_argument("--last", type=int)
    g.add_argument("--utt-list")
    sp.set_defaults(fn=cmd_subset)
    sp = sub.add_parser("utt2spk-to-spk2utt")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_u2s)
    sp = sub.add_parser("spk2utt-to-utt2spk")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_s2u)
    sp = sub.add_parser("apply-map")
    sp.add_argument("map")
    sp.add_argument("-f", "--field", type=int, default=1)
    sp.add_argument("--permissive", action="store_true",
                    help="drop unmapped lines instead of failing")
    sp.set_defaults(fn=cmd_apply_map)
    sp = sub.add_parser("filter-scp")
    sp.add_argument("ids")
    sp.add_argument("-f", "--field", type=int, default=1)
    sp.add_argument("--exclude", action="store_true")
    sp.set_defaults(fn=cmd_filter_scp)
    sp = sub.add_parser("utt2dur")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_utt2dur)
    sp = sub.add_parser("split-data")
    sp.add_argument("dir")
    sp.add_argument("n", type=int)
    sp.set_defaults(fn=cmd_split_data)
    sp = sub.add_parser("resample")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--fs", type=int, required=True)
    sp.add_argument("--wav-outdir")
    sp.set_defaults(fn=cmd_resample)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
