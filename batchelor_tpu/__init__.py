"""batchelor_tpu: TPU-native single-cell batch correction (MNN family).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
Bioconductor batchelor package (reference mounted at /root/reference):
cosine/multi-batch normalization, weighted multi-batch PCA, fastMNN,
classic mnnCorrect, clusterMNN, linear baselines, diagnostics, and a
dispatch API — designed for SPMD execution over TPU device meshes.

Orientation convention: cells are rows everywhere (N x G), 0-based indices.
"""

from .ops.cosine_norm import cosine_norm, apply_cosine_norm
from .ops.pca import multi_batch_pca, MultiBatchPCAResult
from .ops.knn import query_knn
from .ops.mutual_nn import find_mutual_nn, choose_k
from .ops.correction import (
    tricube_average,
    average_correction,
    center_along_batch_vector,
)
from .correct.fast_mnn import fast_mnn, reduced_mnn, MNNResult, MergeStepInfo
from .utils.batching import (
    divide_into_batches,
    restore_original_order,
    reindex_pairings,
    intersect_rows,
    check_batch_consistency,
    check_restrictions,
)

__version__ = "0.1.0"
