"""Dataset downloader (API parity target: /root/reference/util/get_data.py,
the pix2pix-template scraper for the Berkeley CycleGAN/pix2pix archives).

Full behavioural parity with the reference, stdlib-only:

- lists the ``.zip`` / ``tar.gz`` options scraped from the archive index
  page (reference ``_get_options``/``_present_options``, util/get_data.py:40-55)
  using ``html.parser`` instead of BeautifulSoup;
- interactive selection when no dataset is named (``get(save_path)``);
- downloads via ``urllib`` (works for ``file://`` URLs too, which is how the
  offline tests exercise the full path), unpacks the archive into
  ``save_path`` and removes the temporary file
  (reference ``_download_data``, util/get_data.py:57-78);
- voids the download with a warning when the target directory already
  exists, and returns the absolute dataset path (util/get_data.py:80-111).

In this no-egress environment remote URLs fail inside ``urllib`` with a
clear error; ``scripts/generate_synthetic.py`` is the supported offline way
to produce training data.
"""

from __future__ import annotations

import os
import tarfile
import zipfile
from html.parser import HTMLParser
from urllib.request import urlopen
from warnings import warn


class _AnchorTextParser(HTMLParser):
    """Collects the text of ``<a href=...>`` elements, like the reference's
    ``soup.find_all('a', href=True)`` + ``.text`` (util/get_data.py:42-44)."""

    def __init__(self):
        super().__init__()
        self._in_anchor = False
        self._buf = []
        self.anchor_texts = []

    def handle_starttag(self, tag, attrs):
        if tag == "a" and any(k == "href" for k, _ in attrs):
            self._in_anchor = True
            self._buf = []

    def handle_data(self, data):
        if self._in_anchor:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == "a" and self._in_anchor:
            self._in_anchor = False
            self.anchor_texts.append("".join(self._buf))


class GetData:
    """A helper for downloading CycleGAN or pix2pix datasets.

    Parameters:
        technique (str) -- One of: 'cyclegan' or 'pix2pix'.
        verbose (bool)  -- If True, print additional information.

    Examples:
        >>> from neuroclear_tpu.utils import GetData
        >>> gd = GetData(technique='cyclegan')
        >>> new_data_path = gd.get(save_path='./datasets')  # presents options
    """

    def __init__(self, technique: str = "cyclegan", verbose: bool = True):
        url_dict = {
            "pix2pix": "http://efrosgans.eecs.berkeley.edu/pix2pix/datasets/",
            "cyclegan": "https://people.eecs.berkeley.edu/~taesung_park/CycleGAN/datasets",
        }
        self.url = url_dict.get(technique.lower())
        self._verbose = verbose

    def _print(self, text: str) -> None:
        if self._verbose:
            print(text)

    @staticmethod
    def _get_options(html_text: str):
        parser = _AnchorTextParser()
        parser.feed(html_text)
        return [t for t in parser.anchor_texts
                if t.endswith((".zip", "tar.gz"))]

    def _fetch(self, url: str) -> bytes:
        try:
            with urlopen(url) as r:
                return r.read()
        except OSError as e:
            raise RuntimeError(
                f"Could not fetch {url} ({e}); this environment may have no "
                "network egress — pass a local archive via dataset=..., or "
                "generate data with scripts/generate_synthetic.py.") from e

    def _present_options(self) -> str:
        options = self._get_options(
            self._fetch(self.url).decode("utf-8", errors="replace"))
        print("Options:\n")
        for i, o in enumerate(options):
            print(f"{i}: {o}")
        choice = input("\nPlease enter the number of the "
                       "dataset above you wish to download:")
        return options[int(choice)]

    def _download_data(self, dataset_url: str, save_path: str) -> None:
        os.makedirs(save_path, exist_ok=True)
        base = os.path.basename(dataset_url)
        temp_save_path = os.path.join(save_path, base)

        with open(temp_save_path, "wb") as f:
            f.write(self._fetch(dataset_url))

        self._print("Unpacking Data...")
        self._extract_archive(temp_save_path, save_path)
        os.remove(temp_save_path)

    @staticmethod
    def _extract_archive(archive: str, save_path: str) -> None:
        base = os.path.basename(archive)
        if base.endswith(".tar.gz") or base.endswith(".tgz"):
            with tarfile.open(archive) as tf:
                tf.extractall(save_path, filter="data")
        elif base.endswith(".zip"):
            with zipfile.ZipFile(archive) as zf:
                zf.extractall(save_path)
        else:
            raise ValueError(f"Unknown File Type: {base}.")

    def get(self, save_path: str, dataset: str | None = None) -> str:
        """Download (or locally unpack) a dataset.

        Parameters:
            save_path (str) -- A directory to save the data to.
            dataset (str)   -- (optional). A dataset archive name (resolved
                against the technique's index URL), a full URL (http/https/
                file), or a local archive path.  If None, the index page is
                scraped and options are presented interactively.

        Returns:
            save_path_full (str) -- absolute path to the unpacked dataset.
        """
        if dataset is None:
            selected_dataset = self._present_options()
        else:
            selected_dataset = dataset

        base = os.path.basename(selected_dataset)
        save_path_full = os.path.join(save_path, base.split(".")[0])

        if os.path.isdir(save_path_full):
            warn(f"\n'{save_path_full}' already exists. Voiding Download.")
        elif os.path.isfile(selected_dataset):
            # Local archive: unpack directly (offline path).
            os.makedirs(save_path, exist_ok=True)
            self._print("Unpacking Data...")
            self._extract_archive(selected_dataset, save_path)
        else:
            self._print("Downloading Data...")
            if "://" in selected_dataset:
                url = selected_dataset
            else:
                url = f"{self.url}/{selected_dataset}"
            self._download_data(url, save_path=save_path)

        return os.path.abspath(save_path_full)
