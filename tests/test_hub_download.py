"""Google Drive downloader: virus-scan interstitial handling.

The reference relies on gdown for the confirm-token dance
(/root/reference/parallel_wavegan/utils/utils.py:363-421); our urllib
implementation must survive both the cookie-token and the
drive.usercontent form variants without network access, so the opener is
mocked here.
"""

import io
import tarfile

import pytest

from parallelwavegan_tpu.utils.hub import _download_gdrive


class _FakeResponse:
    def __init__(self, data: bytes, ctype: str):
        self._buf = io.BytesIO(data)
        self.headers = {"Content-Type": ctype}

    def read(self, n=-1):
        return self._buf.read(n)


class _FakeCookie:
    def __init__(self, name, value):
        self.name = name
        self.value = value


class _FakeOpener:
    """Scripted opener: each entry is (expected_substrings, response)."""

    def __init__(self, script):
        self.script = list(script)
        self.requests = []
        self.cookiejar = []

    def open(self, url):
        self.requests.append(url)
        expected, response, cookies = self.script.pop(0)
        for sub in expected:
            assert sub in url, (sub, url)
        self.cookiejar.extend(cookies)
        return response


PAYLOAD = b"\x1f\x8b" + bytes(range(256)) * 512  # binary, not html


def test_direct_download(tmp_path):
    out = tmp_path / "model.tar.gz"
    opener = _FakeOpener(
        [
            (
                ["uc?export=download", "id=FILEID"],
                _FakeResponse(PAYLOAD, "application/octet-stream"),
                [],
            )
        ]
    )
    _download_gdrive("FILEID", str(out), opener=opener)
    assert out.read_bytes() == PAYLOAD


def test_cookie_confirm_token(tmp_path):
    out = tmp_path / "model.tar.gz"
    interstitial = b"<html>Google Drive can't scan this file for viruses</html>"
    opener = _FakeOpener(
        [
            (
                ["id=FILEID"],
                _FakeResponse(interstitial, "text/html; charset=utf-8"),
                [_FakeCookie("download_warning_13058876669334088843", "t0k3n")],
            ),
            (
                ["confirm=t0k3n", "id=FILEID"],
                _FakeResponse(PAYLOAD, "application/x-gzip"),
                [],
            ),
        ]
    )
    _download_gdrive("FILEID", str(out), opener=opener)
    assert out.read_bytes() == PAYLOAD
    assert len(opener.requests) == 2


def test_form_confirm_flow(tmp_path):
    """The modern interstitial: no cookie, hidden form to usercontent."""
    out = tmp_path / "model.tar.gz"
    interstitial = (
        b'<html><form id="download-form" '
        b'action="https://drive.usercontent.google.com/download" method="get">'
        b'<input type="hidden" name="id" value="FILEID">'
        b'<input type="hidden" name="export" value="download">'
        b'<input type="hidden" name="confirm" value="t">'
        b'<input type="hidden" name="uuid" value="abc-123">'
        b"</form></html>"
    )
    opener = _FakeOpener(
        [
            (
                ["drive.google.com/uc"],
                _FakeResponse(interstitial, "text/html; charset=utf-8"),
                [],
            ),
            (
                [
                    "drive.usercontent.google.com/download",
                    "confirm=t",
                    "uuid=abc-123",
                ],
                _FakeResponse(PAYLOAD, "application/octet-stream"),
                [],
            ),
        ]
    )
    _download_gdrive("FILEID", str(out), opener=opener)
    assert out.read_bytes() == PAYLOAD


def test_interstitial_without_token_raises(tmp_path):
    out = tmp_path / "model.tar.gz"
    opener = _FakeOpener(
        [
            (
                [],
                _FakeResponse(
                    b"<html>Quota exceeded</html>", "text/html"
                ),
                [],
            )
        ]
    )
    with pytest.raises(RuntimeError, match="confirm"):
        _download_gdrive("FILEID", str(out), opener=opener)
    assert not out.exists()


def test_streamed_large_payload(tmp_path):
    """Multi-chunk read path (the >100 MB case, scaled down)."""
    out = tmp_path / "model.tar.gz"
    big = bytes(range(256)) * (8 << 10)  # 2 MiB -> several 1 MiB chunks
    opener = _FakeOpener(
        [([], _FakeResponse(big, "application/octet-stream"), [])]
    )
    _download_gdrive("FILEID", str(out), opener=opener)
    assert out.read_bytes() == big


def test_download_pretrained_model_extracts(tmp_path, monkeypatch):
    """End-to-end: mocked download -> tar extract -> checkpoint discovery."""
    import parallelwavegan_tpu.utils.hub as hub

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        data = b"fake-checkpoint"
        info = tarfile.TarInfo("exp/train/checkpoint-400000steps.pkl")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
        cfg = b"generator_type: HiFiGANGenerator\n"
        info = tarfile.TarInfo("exp/train/config.yml")
        info.size = len(cfg)
        tar.addfile(info, io.BytesIO(cfg))
    tarball = buf.getvalue()

    def fake_download(file_id, output_path, opener=None):
        assert file_id == hub.PRETRAINED_MODEL_LIST["ljspeech_hifigan.v1"]
        with open(output_path, "wb") as f:
            f.write(tarball)

    monkeypatch.setattr(hub, "_download_gdrive", fake_download)
    ckpt = hub.download_pretrained_model(
        "ljspeech_hifigan.v1", download_dir=str(tmp_path)
    )
    assert ckpt.endswith("checkpoint-400000steps.pkl")
    with open(ckpt, "rb") as f:
        assert f.read() == b"fake-checkpoint"


def test_form_confirm_flow_reversed_attrs_and_relative_action(tmp_path):
    """Markup variants gdown tolerates: value-before-name attribute order,
    value-less inputs, and a RELATIVE form action."""
    payload = b"PAYLOADDATA"
    pages = [
        _FakeResponse(
            b'<html><form id="download-form" action="/download" method="get">'
            b'<input type="hidden" value="FILEID" name="id">'
            b'<input type="hidden" name="confirm">'
            b'<input type="hidden" value="t" name="export">'
            b"</form></html>",
            "text/html; charset=utf-8",
        ),
        _FakeResponse(payload, "application/gzip"),
    ]
    seen = []

    class Opener:
        cookiejar = ()

        def open(self, url):
            seen.append(url)
            return pages.pop(0)

    out = tmp_path / "model.tar.gz"
    _download_gdrive("FILEID", str(out), opener=Opener())
    assert out.read_bytes() == payload
    assert seen[1].startswith("https://drive.google.com/download?")
    assert "id=FILEID" in seen[1] and "confirm=" in seen[1]
