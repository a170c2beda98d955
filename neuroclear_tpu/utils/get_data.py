"""Dataset downloader (API parity target: /root/reference/util/get_data.py,
a pix2pix-template scraper for the Berkeley CycleGAN archives — irrelevant to
the microscopy workflow but part of the reference surface).

This environment has no network egress, so downloads raise a clear error;
`GetData` can still unpack local archives into the dataroot layout, and the
synthetic generator (utils/synthetic.py + scripts/generate_synthetic.py) is
the supported way to produce training data offline.
"""

from __future__ import annotations

import os
import tarfile
import zipfile


class GetData:
    """GetData(technique='cyclegan'|'pix2pix', save_path=...).get(url=None)

    With a local archive path, extracts it; with a URL, raises (no egress).
    """

    def __init__(self, technique: str = "cyclegan", verbose: bool = True):
        url_dict = {
            "pix2pix": "http://efrosgans.eecs.berkeley.edu/pix2pix/datasets/",
            "cyclegan": "https://people.eecs.berkeley.edu/~taesung_park/CycleGAN/datasets",
        }
        self.url = url_dict[technique.lower()]
        self._verbose = verbose

    def _print(self, text: str) -> None:
        if self._verbose:
            print(text)

    def get(self, save_path: str, dataset=None):
        if dataset is None or dataset.startswith(("http://", "https://")):
            raise RuntimeError(
                "This environment has no network egress; pass a local archive "
                "path, or generate data with scripts/generate_synthetic.py.")
        return self._extract(dataset, save_path)

    def _extract(self, archive: str, save_path: str) -> str:
        os.makedirs(save_path, exist_ok=True)
        base = os.path.basename(archive)
        if base.endswith(".tar.gz") or base.endswith(".tgz"):
            with tarfile.open(archive) as tf:
                tf.extractall(save_path)
        elif base.endswith(".zip"):
            with zipfile.ZipFile(archive) as zf:
                zf.extractall(save_path)
        else:
            raise ValueError(f"Unknown archive type: {base}")
        out = os.path.join(save_path, base.split(".")[0])
        self._print(f"Extracted {archive} -> {out}")
        return out
