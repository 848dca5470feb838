"""Window encoding + batched TPU inference + per-contig score merge.

Replicates the data semantics of the reference NN module
(genomad/modules/nn_classification.py:54-100, 316-320):

  * contigs are read with strip_n, split into 6,000 bp windows
    (min 2,500 bp; a short first window is always kept);
  * windows after the first are dropped if they contain > 4,000 Ns;
  * windows are N-padded to 6,000 bp and tokenized into 5,997 4-mer tokens;
  * per-window class probabilities are averaged per contig (segment mean).

Re-design notes: the reference serializes windows to TFRecord shards and
streams them through tf.data. Here windows are encoded straight into a
packed int32 token matrix (memory: 4 bytes x 5,997 per window ~ 24 KB/window,
i.e. ~4 MB per Mbp of input) and fed to the jitted IGLOO forward in
fixed-shape batches (one XLA compilation) with the batch axis sharded across
the 'data' mesh axis.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import numpy as np

from genomad_tpu import sequence
from genomad_tpu.models import igloo
from genomad_tpu.parallel import mesh as meshlib

WINDOW_LENGTH = 6_000
MIN_WINDOW_LENGTH = 2_500
MAX_WINDOW_NS = 4_000


def encode_windows(fasta_path: Path, single_window: bool = False):
    """Encode a FASTA file into (base_codes, contig_names, contig_ids).

    base_codes: uint8 (n_windows, 6000) with ACGT=0..3, N/other=4 (the
    model's fast embedding path consumes base codes directly; tokens are
    derived on device — see igloo.build_base_tables). contig_ids maps
    window -> contig index.
    """
    contig_names: list[str] = []
    contig_ids: list[int] = []
    base_rows: list[np.ndarray] = []
    max_windows = 1 if single_window else None
    for contig_id, seq in enumerate(sequence.read_fasta(fasta_path, strip_n=True)):
        contig_names.append(seq.accession)
        for window_n, window in enumerate(
            sequence.seq_windows(seq, WINDOW_LENGTH, MIN_WINDOW_LENGTH, max_windows=max_windows)
        ):
            if window_n > 0 and window.count("N") > MAX_WINDOW_NS:
                continue
            padded = window.seq_ascii.ljust(WINDOW_LENGTH, b"N")
            base_rows.append(
                sequence._BASE_CODES[np.frombuffer(padded, np.uint8)].astype(np.uint8)
            )
            contig_ids.append(contig_id)
    if base_rows:
        bases = np.stack(base_rows)
    else:
        bases = np.zeros((0, WINDOW_LENGTH), dtype=np.uint8)
    return bases, np.array(contig_names), np.array(contig_ids, dtype=np.int32)


def predict_windows(
    forward: Callable,
    windows: np.ndarray,
    batch_size: int = 128,
    mesh=None,
    progress: Callable[[int, int], None] | None = None,
    pad_value: int = 4,
) -> np.ndarray:
    """Run the window classifier over all windows in fixed-shape batches.

    ``windows`` is the encoded matrix (base codes (N, 6000) for the fast
    path, or tokens (N, 5997) for the token path); it is padded to a full
    final batch (padding rows are all-N windows) so XLA compiles exactly
    one program; with a mesh, each batch is placed with its leading axis
    sharded over the 'data' axis.
    """
    n = windows.shape[0]
    if n == 0:
        return np.zeros((0, igloo.N_CLASSES), dtype=np.float32)
    windows = np.ascontiguousarray(windows, dtype=np.int32)
    if mesh is not None:
        n_data = mesh.shape["data"]
        batch_size = meshlib.pad_to_multiple(batch_size, n_data)
        sharding = meshlib.data_sharding(mesh)
    else:
        sharding = None
    n_padded = meshlib.pad_to_multiple(n, batch_size)
    if n_padded != n:
        windows = np.concatenate(
            [windows, np.full((n_padded - n, windows.shape[1]), pad_value, dtype=windows.dtype)]
        )
    outputs = []
    n_batches = n_padded // batch_size
    for i in range(n_batches):
        batch = windows[i * batch_size : (i + 1) * batch_size]
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        # keep results on device: dispatch stays async so host encoding/
        # upload of batch i+1 overlaps device compute of batch i
        outputs.append(forward(batch))
        if progress is not None:
            progress(i + 1, n_batches)
    return np.concatenate([np.asarray(o, dtype=np.float32) for o in outputs])[:n]


def segment_mean(window_preds: np.ndarray, contig_ids: np.ndarray, n_contigs: int) -> np.ndarray:
    """Average window predictions per contig (reference:
    nn_classification.py:320, tf.math.segment_mean)."""
    sums = np.zeros((n_contigs, window_preds.shape[1]), dtype=np.float64)
    np.add.at(sums, contig_ids, window_preds)
    counts = np.bincount(contig_ids, minlength=n_contigs).astype(np.float64)
    counts = np.maximum(counts, 1)
    return (sums / counts[:, None]).astype(np.float32)
