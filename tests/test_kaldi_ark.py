"""Native kaldi binary ark reader/writer (utils/kaldi_ark.py).

The reference reads these through kaldiio (scp_dataset.py:18-42); here the
format is implemented natively, pinned by write/read roundtrips and
hand-constructed compressed-matrix fixtures.
"""

import struct

import numpy as np

from parallelwavegan_tpu.utils.kaldi_ark import (
    ArkScpLoader,
    read_ark,
    read_ark_entry,
    read_kaldi_object,
    write_ark,
)


def test_write_read_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    data = {
        "utt_a": rs.randn(17, 80).astype(np.float32),
        "utt_b": rs.randn(5, 3).astype(np.float32),
        "vec_c": rs.randn(23).astype(np.float32),
    }
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_ark(ark, data, scp)

    loaded = read_ark(ark)
    assert set(loaded) == set(data)
    for k in data:
        np.testing.assert_array_equal(loaded[k], data[k])

    loader = ArkScpLoader(scp)
    assert set(loader.keys()) == set(data)
    np.testing.assert_array_equal(loader["utt_a"], data["utt_a"])
    np.testing.assert_array_equal(loader["vec_c"], data["vec_c"])
    # offset entries resolve independently too
    np.testing.assert_array_equal(
        read_ark_entry(loader.get_path("utt_b")), data["utt_b"]
    )


def _cm_global_header(min_value, rng, rows, cols):
    return struct.pack("<ffii", min_value, rng, rows, cols)


def test_compressed_cm2_cm3(tmp_path):
    """Hand-built CM2 (uint16) and CM3 (uint8) entries decode per spec."""
    rows, cols = 3, 4
    min_value, rng = -2.0, 4.0

    codes16 = np.arange(rows * cols, dtype="<u2") * 5000
    blob = b"\x00B" + b"CM2 " + _cm_global_header(min_value, rng, rows, cols)
    blob += codes16.tobytes()
    import io

    got = read_kaldi_object(io.BytesIO(blob))
    want = (min_value + rng * codes16.astype(np.float64) / 65535.0).reshape(
        rows, cols
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    codes8 = np.arange(rows * cols, dtype=np.uint8) * 20
    blob = b"\x00B" + b"CM3 " + _cm_global_header(min_value, rng, rows, cols)
    blob += codes8.tobytes()
    got = read_kaldi_object(io.BytesIO(blob))
    want = (min_value + rng * codes8.astype(np.float64) / 255.0).reshape(
        rows, cols
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_compressed_cm1_piecewise():
    """CM1 columns decode through the percentile piecewise-linear map."""
    import io

    rows, cols = 4, 2
    min_value, rng = 0.0, 65535.0  # so uint16 percentile p maps to float(p)
    # percentiles per column: p0, p25, p75, p100
    pch = np.array([[0, 100, 200, 300], [1000, 1100, 1200, 1300]], "<u2")
    codes = np.array(
        [[0, 64, 128, 255], [32, 192, 200, 224]], np.uint8
    )  # (cols, rows) column-major storage
    blob = b"\x00B" + b"CM " + _cm_global_header(min_value, rng, rows, cols)
    blob += pch.tobytes() + codes.tobytes()
    got = read_kaldi_object(io.BytesIO(blob))

    def decode(p, b):
        p0, p25, p75, p100 = [float(v) for v in p]
        if b <= 64:
            return p0 + (p25 - p0) * b / 64.0
        if b <= 192:
            return p25 + (p75 - p25) * (b - 64) / 128.0
        return p75 + (p100 - p75) * (b - 192) / 63.0

    want = np.array(
        [[decode(pch[c], codes[c, r]) for c in range(cols)] for r in range(rows)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mel_scp_dataset_reads_ark(tmp_path):
    """MelSCPDataset consumes a feats.scp pointing at a binary ark."""
    from parallelwavegan_tpu.data.datasets import MelSCPDataset

    rs = np.random.RandomState(1)
    data = {f"utt{i}": rs.randn(30 + i, 80).astype(np.float32) for i in range(3)}
    write_ark(str(tmp_path / "feats.ark"), data, str(tmp_path / "feats.scp"))
    ds = MelSCPDataset(str(tmp_path / "feats.scp"), return_utt_id=True)
    assert len(ds) == 3
    utt_id, mel = ds[0]
    np.testing.assert_array_equal(mel, data[utt_id])
