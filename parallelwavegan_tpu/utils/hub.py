"""Pretrained-model hub.

Behavioral reference: /root/reference/parallel_wavegan/utils/utils.py:22-58
(tag -> Google Drive id registry) and :363-421 (download + FileLock +
tar extract). The registry is carried over verbatim as the public model
catalog; downloads fetch through Google Drive's direct-download endpoint
via urllib (gdown is not a dependency) and convert the torch checkpoint to
the native format on first use via bin/convert_checkpoint.
"""

from __future__ import annotations

import os
import re
import tarfile

from parallelwavegan_tpu.utils.io import find_files

PRETRAINED_MODEL_LIST = {
    "ljspeech_parallel_wavegan.v1": "1PdZv37JhAQH6AwNh31QlqruqrvjTBq7U",
    "ljspeech_parallel_wavegan.v1.long": "1A9TsrD9fHxFviJVFjCk5W6lkzWXwhftv",
    "ljspeech_parallel_wavegan.v1.no_limit": "1CdWKSiKoFNPZyF1lo7Dsj6cPKmfLJe72",
    "ljspeech_parallel_wavegan.v3": "1-oZpwpWZMMolDYsCqeL12dFkXSBD9VBq",
    "ljspeech_melgan.v1": "1i7-FPf9LPsYLHM6yNPoJdw5Q9d28C-ip",
    "ljspeech_melgan.v1.long": "1x1b_R7d2561nqweK3FPb2muTdcFIYTu6",
    "ljspeech_melgan.v3": "1J5gJ_FUZhOAKiRFWiAK6FcO5Z6oYJbmQ",
    "ljspeech_melgan.v3.long": "124JnaLcRe7TsuAGh3XIClS3C7Wom9AU2",
    "ljspeech_full_band_melgan.v2": "1Kb7q5zBeQ30Wsnma0X23G08zvgDG5oen",
    "ljspeech_multi_band_melgan.v2": "1b70pJefKI8DhGYz4SxbEHpxm92tj1_qC",
    "ljspeech_hifigan.v1": "1i6-hR_ksEssCYNlNII86v3AoeA1JcuWD",
    "ljspeech_style_melgan.v1": "10aJSZfmCAobQJgRGio6cNyw6Xlgmme9-",
    "jsut_parallel_wavegan.v1": "1qok91A6wuubuz4be-P9R2zKhNmQXG0VQ",
    "jsut_multi_band_melgan.v2": "1chTt-76q2p69WPpZ1t1tt8szcM96IKad",
    "jsut_hifigan.v1": "1vdgqTu9YKyGMCn-G7H2fI6UBC_4_55XB",
    "jsut_style_melgan.v1": "1VIkjSxYxAGUVEvJxNLaOaJ7Twe48SH-s",
    "csmsc_parallel_wavegan.v1": "1QTOAokhD5dtRnqlMPTXTW91-CG7jf74e",
    "csmsc_multi_band_melgan.v2": "1G6trTmt0Szq-jWv2QDhqglMdWqQxiXQT",
    "csmsc_hifigan.v1": "1fVKGEUrdhGjIilc21Sf0jODulAq6D1qY",
    "csmsc_style_melgan.v1": "1kGUC_b9oVSv24vZRi66AAbSNUKJmbSCX",
    "arctic_slt_parallel_wavegan.v1": "1_MXePg40-7DTjD0CDVzyduwQuW_O9aA1",
    "jnas_parallel_wavegan.v1": "1D2TgvO206ixdLI90IqG787V6ySoXLsV_",
    "vctk_parallel_wavegan.v1": "1bqEFLgAroDcgUy5ZFP4g2O2MwcwWLEca",
    "vctk_parallel_wavegan.v1.long": "1tO4-mFrZ3aVYotgg7M519oobYkD4O_0-",
    "vctk_multi_band_melgan.v2": "10PRQpHMFPE7RjF-MHYqvupK9S0xwBlJ_",
    "vctk_hifigan.v1": "1oVOC4Vf0DYLdDp4r7GChfgj7Xh5xd0ex",
    "vctk_style_melgan.v1": "14ThSEgjvl_iuFMdEGuNp7d3DulJHS9Mk",
    "libritts_parallel_wavegan.v1": "1zHQl8kUYEuZ_i1qEFU6g2MEu99k3sHmR",
    "libritts_parallel_wavegan.v1.long": "1b9zyBYGCCaJu0TIus5GXoMF8M3YEbqOw",
    "libritts_multi_band_melgan.v2": "1kIDSBjrQvAsRewHPiFwBZ3FDelTWMp64",
    "libritts_hifigan.v1": "1_TVFIvVtMn-Z4NiQrtrS20uSJOvBsnu1",
    "libritts_style_melgan.v1": "1yuQakiMP0ECdB55IoxEGCbXDnNkWCoBg",
    "kss_parallel_wavegan.v1": "1mLtQAzZHLiGSWguKCGG0EZa4C_xUO5gX",
    "hui_acg_hokuspokus_parallel_wavegan.v1": "1irKf3okMLau56WNeOnhr2ZfSVESyQCGS",
    "ruslan_parallel_wavegan.v1": "1M3UM6HN6wrfSe5jdgXwBnAIl_lJzLzuI",
}


def download_pretrained_model(tag_or_url: str, download_dir: str | None = None) -> str:
    """Download (or locate a cached) pretrained checkpoint tarball.

    Returns the path of the extracted ``checkpoint*.pkl``.
    """
    if download_dir is None:
        download_dir = os.path.expanduser("~/.cache/parallel_wavegan")
    if tag_or_url in PRETRAINED_MODEL_LIST:
        id_ = PRETRAINED_MODEL_LIST[tag_or_url]
        tag = tag_or_url
    else:
        assert (
            "drive.google.com" in tag_or_url
        ), "Unknown URL format. Please use google drive for the model."
        id_ = re.compile(r"/[-\w]{25,}").findall(tag_or_url)[0][1:]
        tag = id_
    output_path = f"{download_dir}/{tag}.tar.gz"
    os.makedirs(download_dir, exist_ok=True)

    from filelock import FileLock

    with FileLock(output_path + ".lock"):
        if not os.path.exists(output_path):
            _download_gdrive(id_, output_path)
            with tarfile.open(output_path, "r:*") as tar:
                for member in tar.getmembers():
                    if member.isreg():
                        member.name = os.path.basename(member.name)
                        tar.extract(member, f"{download_dir}/{tag}")
    checkpoint_path = find_files(f"{download_dir}/{tag}", "checkpoint*.pkl")
    if not checkpoint_path:
        raise FileNotFoundError(
            f"no checkpoint*.pkl found under {download_dir}/{tag}"
        )
    return checkpoint_path[0]


def _download_gdrive(file_id: str, output_path: str, opener=None):
    """Fetch a Google Drive file, handling the virus-scan interstitial.

    Files over ~100 MB (most released checkpoints) get an HTML warning page
    instead of the payload; gdown resolves it via a confirm token carried in
    either a ``download_warning`` cookie or a hidden form posting to
    drive.usercontent.google.com (reference utils/utils.py:363-421 uses
    gdown). This reimplements that dance with urllib. ``opener`` is
    injectable for tests.
    """
    import html
    import http.cookiejar
    import urllib.parse
    import urllib.request

    if opener is None:  # pragma: no cover - requires network
        jar = http.cookiejar.CookieJar()
        opener = urllib.request.build_opener(
            urllib.request.HTTPCookieProcessor(jar)
        )
    else:
        jar = getattr(opener, "cookiejar", ())

    url = f"https://drive.google.com/uc?export=download&id={file_id}"
    try:
        for _ in range(4):
            resp = opener.open(url)
            ctype = resp.headers.get("Content-Type", "")
            if "text/html" not in ctype:
                with open(output_path, "wb") as f:
                    while True:
                        chunk = resp.read(1 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
                return
            body = resp.read().decode("utf-8", errors="replace")
            token = next(
                (c.value for c in jar if c.name.startswith("download_warning")),
                None,
            )
            if token:
                url = (
                    "https://drive.google.com/uc?export=download"
                    f"&id={file_id}&confirm={token}"
                )
                continue
            m = re.search(r'<form[^>]*\baction="([^"]*)"', body) or re.search(
                r'\baction="([^"]+)"', body
            )
            # per-tag parse: attribute order varies and value may be absent
            fields = {}
            for tag in re.findall(r"<input[^>]*>", body):
                nm = re.search(r'\bname="([^"]*)"', tag)
                if nm is None:
                    continue
                vm = re.search(r'\bvalue="([^"]*)"', tag)
                fields[html.unescape(nm.group(1))] = html.unescape(
                    vm.group(1) if vm else ""
                )
            if m and fields:
                action = html.unescape(m.group(1))
                # the action may be relative to the interstitial page
                base = (getattr(resp, "geturl", lambda: "")()
                        or "https://drive.google.com/")
                action = urllib.parse.urljoin(base, action)
                sep = "&" if "?" in action else "?"
                url = action + sep + urllib.parse.urlencode(fields)
                continue
            raise RuntimeError(
                "Google Drive returned an interstitial without a confirm "
                "token (quota exceeded or permission denied?)"
            )
        raise RuntimeError("too many Google Drive interstitial redirects")
    except RuntimeError:
        raise
    except Exception as e:  # pragma: no cover - requires network
        raise RuntimeError(
            f"failed to download {url}; if this environment has no "
            "egress, place the tarball at "
            f"{output_path} manually"
        ) from e
