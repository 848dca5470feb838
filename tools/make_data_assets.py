"""Vendor the small frozen data assets (parameter tables, not code) that the
pipeline needs for behavioral parity with geNomad v1.12.0.

Sources (all are data files bundled with the reference distribution):
  - rbs_categories.tsv            (390 RBS motif -> category rows)
  - score_calibration_weights.npz (18 arrays: 6->20->20->3 MLP per classifier)

Run:  python tools/make_data_assets.py [REFERENCE_CHECKOUT]
"""

import shutil
import sys
from pathlib import Path

import numpy as np


def main(reference: Path) -> None:
    src = reference / "genomad" / "data"
    dst = Path(__file__).resolve().parents[1] / "genomad_tpu" / "data"
    dst.mkdir(parents=True, exist_ok=True)

    shutil.copy(src / "rbs_categories.tsv", dst / "rbs_categories.tsv")

    # Re-save the calibration weights through numpy so the artifact is
    # regenerated rather than byte-copied (and verified loadable).
    with np.load(src / "score_calibration_weights.npz") as npz:
        arrays = {k: np.asarray(npz[k]) for k in npz.files}
    np.savez_compressed(dst / "score_calibration_weights.npz", **arrays)
    print(f"wrote {dst / 'rbs_categories.tsv'}")
    print(f"wrote {dst / 'score_calibration_weights.npz'} ({sorted(arrays)})")


if __name__ == "__main__":
    ref = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    main(ref)
