"""Dataset downloaders: YouTube (yt-dlp, gated) + OneDrive share links.

Capability match of reference workoutdetector/scripts/download.py:10-64
and the OneDrive trick at datasets/repcount_dataset.py:88-101. yt-dlp is
not in this image (and the container is zero-egress), so downloads are
gated behind import/availability with clear errors; idempotency (skip
existing files, reference :46-49) is preserved.
"""

from __future__ import annotations

import base64
import os
import os.path as osp
from typing import Iterable, Optional


def parse_onedrive(link: str) -> str:
    """OneDrive share link → direct-download URL (base64 share-token API).

    >>> parse_onedrive('https://1drv.ms/u/s!AAAA')  # doctest: +ELLIPSIS
    'https://api.onedrive.com/v1.0/shares/u!.../root/content'
    """
    assert link.startswith("https://1drv.ms/u/s!"), "not a OneDrive share link"
    token = base64.urlsafe_b64encode(link.strip().encode("ascii")).decode("ascii")
    return f"https://api.onedrive.com/v1.0/shares/u!{token}/root/content"


def download_ytb(url: str, folder: str = "~") -> Optional[str]:
    """Download one YouTube video at ≤720p mp4 (reference :26-37).
    Skips if already present."""
    folder = osp.expanduser(folder)
    vid = url[-11:]
    out = osp.join(folder, f"{vid}.mp4")
    if osp.exists(out):
        return out
    try:
        import yt_dlp
    except ImportError as e:
        raise RuntimeError(
            "yt-dlp is not installed in this image; dataset videos must be "
            "provisioned out-of-band (e.g. mounted or copied in)") from e
    opts = {
        "outtmpl": out,
        "quiet": True,
        "ignoreerrors": True,
        "format": "bv[height<=720]",
    }
    with yt_dlp.YoutubeDL(opts) as ydl:
        ydl.download([url])
    return out if osp.exists(out) else None


def download_countix(csv_path: str, folder: str) -> None:
    """Fetch every video_id in a Countix csv (reference :40-52)."""
    import pandas as pd
    os.makedirs(osp.expanduser(folder), exist_ok=True)
    df = pd.read_csv(csv_path)
    for vid in df["video_id"].unique():
        if osp.exists(osp.join(osp.expanduser(folder), f"{vid}.mp4")):
            continue  # idempotent
        download_ytb(f"https://www.youtube.com/watch?v={vid}", folder)


def download_and_extract(url: str, download_root: str, filename: str,
                         extract_root: Optional[str] = None) -> None:
    """Fetch + unzip an archive (the RepcountDataset download path,
    reference repcount_dataset.py:390-401). Zero-egress images raise."""
    import urllib.request
    import zipfile

    os.makedirs(download_root, exist_ok=True)
    archive = osp.join(download_root, filename)
    if not osp.exists(archive):
        urllib.request.urlretrieve(url, archive)
    with zipfile.ZipFile(archive) as z:
        z.extractall(extract_root or download_root)
