"""glam_tpu — a TPU-native adaptive graph-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the GLAM system (Li et al.,
Nature Machine Intelligence 2022; reference implementation in
PyTorch/PyG): molecular property prediction, drug-drug interaction and
drug-target interaction over graph neural networks, with random-search
AutoML, ensembling, and robustness evaluation.

Subpackages:
  chem      SMILES parsing, featurization, scaffolds (RDKit-free)
  data      static-shape GraphBatch, batching, datasets, splits
  ops       segment/scatter kernels (XLA + Pallas)
  nn        layer library + model architectures (flax.linen)
  train     losses, metrics, optimizers, trainers, checkpoints
  parallel  device-mesh data/graph parallelism
  automl    search-space sampling, trial scheduling, ensembling
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "Predictor":
        from .serve import Predictor
        return Predictor
    if name == "EnsemblePredictor":
        from .serve import EnsemblePredictor
        return EnsemblePredictor
    if name == "MolDataset":
        from .data.datasets import MolDataset
        return MolDataset
    if name == "Architecture":
        from .nn.model import Architecture
        return Architecture
    if name == "ModelConfig":
        from .nn.model import ModelConfig
        return ModelConfig
    raise AttributeError(name)
