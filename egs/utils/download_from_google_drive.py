#!/usr/bin/env python3
"""Download a Google-Drive-hosted archive and extract it.

Role equivalent of /root/reference/utils/download_from_google_drive.sh
(gdown + tar/unzip). Uses gdown when installed; otherwise a plain urllib
session with the Drive confirm-token dance.

Usage: download_from_google_drive.py <share_url_or_id> [download_dir] [ext]
"""

import os
import re
import sys
import tarfile
import zipfile


def file_id(url: str) -> str:
    m = re.search(r"id=([\w-]+)", url) or re.search(r"/d/([\w-]+)", url)
    return m.group(1) if m else url


def download(fid: str, out: str):
    try:
        import gdown

        gdown.download(id=fid, output=out, quiet=False)
        return
    except ImportError:
        pass
    import http.cookiejar
    import urllib.request

    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar)
    )
    url = f"https://drive.google.com/uc?export=download&id={fid}"
    with opener.open(url) as r:
        body = r.read()
    m = re.search(rb"confirm=([\w-]+)", body)
    if m:
        url += f"&confirm={m.group(1).decode()}"
        with opener.open(url) as r:
            body = r.read()
    with open(out, "wb") as f:
        f.write(body)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    fid = file_id(sys.argv[1])
    download_dir = sys.argv[2] if len(sys.argv) > 2 else "downloads"
    ext = sys.argv[3] if len(sys.argv) > 3 else "tar.gz"
    os.makedirs(download_dir, exist_ok=True)
    out = os.path.join(download_dir, f"{fid}.{ext}")
    download(fid, out)
    if ext == "zip":
        with zipfile.ZipFile(out) as z:
            z.extractall(download_dir)
    elif ext.startswith("tar"):
        with tarfile.open(out) as t:
            t.extractall(download_dir)
    print(f"downloaded + extracted to {download_dir}")


if __name__ == "__main__":
    main()
