r"""genomad-tpu: TPU-native mobile genetic element classification engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of geNomad
(apcamargo/genomad): virus & plasmid identification in nucleotide FASTA input,
provirus boundary detection, virus taxonomy, and functional gene annotation.

Pipeline (mirrors the reference's module graph, genomad/cli.py:1301-1327):

    annotate -> find-proviruses -> marker-classification \
                          \------> nn-classification -----+-> aggregated-classification
                                                          |     -> [score-calibration] -> summary

Unlike the reference — a CPU pipeline shelling out to MMseqs2/prodigal/aragorn —
every compute stage here is a JAX program: the IGLOO window classifier, the
marker-profile search (k-mer prefilter + banded profile Smith-Waterman), the
CRF provirus tagger, the tree-ensemble evaluator, and the fusion/calibration
heads all run on TPU, with the profile database sharded across a device mesh.
"""

__version__ = "0.5.0"

from genomad_tpu import utils  # noqa: F401
