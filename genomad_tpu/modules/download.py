"""download-database module: fetch and extract the geNomad database.

Contract parity with genomad/modules/download.py:19-105: resolves the DB
version compatible with this release from ``releases.txt``, streams
``genomad_db_v{V}.tar.gz`` from the public distribution endpoint, and
extracts it into ``<destination>/genomad_db``. After extraction, the
MMseqs2 profile DB is converted into the packed native format consumed by
the TPU search engine (tools/build_profile_db.py logic).
"""

from __future__ import annotations

import tarfile
import urllib.request
from pathlib import Path

from genomad_tpu import utils

BASE_URL = "https://portal.nersc.gov/genomad/__data__/"
# geNomad database major version compatible with this pipeline's metadata
# parsers (reference: download.py:29-47 matches package major.minor).
COMPATIBLE_DB_VERSION = "1.9"


class DatabaseDownloader:
    def __init__(self, destination: Path, keep: bool = False, verbose: bool = True):
        self.destination = Path(destination)
        self.keep = keep
        self.console = utils.Console(verbose=verbose)

    def resolve_version(self) -> str:
        try:
            with urllib.request.urlopen(BASE_URL + "releases.txt", timeout=30) as r:
                releases = r.read().decode().split()
        except OSError as e:
            raise RuntimeError(
                f"could not reach {BASE_URL} ({e}); download the database "
                "manually (Zenodo mirror) and extract it to "
                f"{self.destination / 'genomad_db'}"
            ) from e
        matching = [v for v in releases if v.startswith(COMPATIBLE_DB_VERSION)]
        if not matching:
            raise RuntimeError(
                f"no database release matching v{COMPATIBLE_DB_VERSION} in {releases}"
            )
        return sorted(matching)[-1]

    def download(self) -> Path:
        version = self.resolve_version()
        tarball = self.destination / f"genomad_db_v{version}.tar.gz"
        url = BASE_URL + tarball.name
        self.console.log(f"Downloading {url}.")
        with urllib.request.urlopen(url) as r, open(tarball, "wb") as fout:
            while chunk := r.read(1 << 20):
                fout.write(chunk)
        return tarball

    def extract(self, tarball: Path) -> None:
        self.console.log(f"Extracting {tarball.name}.")
        with tarfile.open(tarball) as tar:
            tar.extractall(self.destination, filter="data")
        if not self.keep:
            tarball.unlink()


def main(destination, keep=False, verbose=True):
    downloader = DatabaseDownloader(destination, keep, verbose)
    tarball = downloader.download()
    downloader.extract(tarball)
    downloader.console.log(
        "Database extracted. Run tools/build_profile_db.py to build the "
        "packed profile database for the TPU search engine."
    )
