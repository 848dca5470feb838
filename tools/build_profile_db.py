"""Build the packed native profile databases from a downloaded geNomad
database directory (thin CLI over genomad_tpu.ops.mmseqs_io — the
download-database module runs the same conversion automatically).

Usage:
    python tools/build_profile_db.py GENOMAD_DB_DIR [--force]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from genomad_tpu.ops import mmseqs_io  # noqa: E402


def main(db_dir: Path, force: bool = False) -> None:
    db_dir = Path(db_dir)
    for src, dst in mmseqs_io.PACKED_TARGETS:
        if not (db_dir / f"{src}.index").exists():
            print(f"skipping {src}: no index file")
            continue
        print(f"converting {src} ...")
        db = mmseqs_io.convert_mmseqs_profile_db(db_dir / src)
        db.save(db_dir / dst)
        print(
            f"  wrote {db_dir / dst}: {db.n_profiles} profiles, "
            f"{db.total_positions} positions"
        )


if __name__ == "__main__":
    main(Path(sys.argv[1]), force="--force" in sys.argv)
