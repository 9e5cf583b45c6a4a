"""Test configuration: force the CPU backend with 8 virtual devices.

The axon TPU plugin pins JAX_PLATFORMS=axon via sitecustomize; tests must
run on host CPU (fast tracing, 8-device mesh for sharding tests), so we
override through jax.config before any backend is initialized."""
import os

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from glam_tpu.chem.featurize import smiles_to_arrays
from glam_tpu.data.graph import GraphArrays


SMILES_SET = [
    "CCO",                                # ethanol
    "c1ccccc1",                           # benzene
    "CC(=O)Oc1ccccc1C(=O)O",              # aspirin
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",       # caffeine
    "Clc1cc2c(Oc3ccccc3C3CN(CC32)C)cc1",  # demo.csv row 1
    "C",                                  # methane (no edges)
]


def graphs_from_smiles(smis, ys=None):
    out = []
    for i, s in enumerate(smis):
        x, snd, rcv, e = smiles_to_arrays(s)
        y = np.array([1.0 if ys is None else ys[i]], np.float32)
        out.append(GraphArrays(nodes=x, edges=e, senders=snd,
                               receivers=rcv, y=y, smi=s))
    return out


@pytest.fixture(scope="session")
def sample_graphs():
    return graphs_from_smiles(SMILES_SET)


@pytest.fixture(scope="session")
def sample_batch(sample_graphs):
    from glam_tpu.data.batching import GraphLoader
    return next(iter(GraphLoader(sample_graphs, batch_size=6, num_tasks=1)))
