"""Atom-level attention visualization.

Parity with the reference Visualizer (src_1gp/visualize_gp.py:40-131):
load a trained checkpoint, run molecules through the model capturing
per-node embeddings, reduce them to per-atom weights (mean absolute
embedding, the reference's ``hidden_node`` mode), and render a 2D
molecule depiction colored by weight.

The reference delegates drawing to RDKit SimilarityMaps; this module
computes its own 2D coordinates (ring-aware spring layout over the
molecular graph) and renders with matplotlib — no RDKit dependency.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..chem.smiles import Mol, parse_smiles


def spring_layout(mol: Mol, iterations: int = 200,
                  seed: int = 0) -> np.ndarray:
    """2D coordinates via Fruchterman-Reingold on the molecular graph."""
    n = mol.num_atoms()
    if n == 1:
        return np.zeros((1, 2), np.float32)
    rng = np.random.RandomState(seed)
    pos = rng.randn(n, 2).astype(np.float64)
    adj = np.zeros((n, n), bool)
    for b in mol.bonds:
        adj[b.a, b.b] = adj[b.b, b.a] = True
    k = 1.0 / np.sqrt(n)
    t = 0.1
    for it in range(iterations):
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.linalg.norm(delta, axis=-1) + 1e-9
        rep = (k * k / dist ** 2)[..., None] * delta
        att = np.where(adj[..., None], (dist / k)[..., None] * -delta, 0.0)
        disp = (rep + att).sum(axis=1)
        length = np.linalg.norm(disp, axis=-1, keepdims=True) + 1e-9
        pos += disp / length * min(t, 1.0)
        t *= 0.98
    pos -= pos.mean(0)
    scale = np.abs(pos).max() + 1e-9
    return (pos / scale).astype(np.float32)


def node_weights_from_embeddings(node_embeddings: np.ndarray) -> np.ndarray:
    """Per-atom scalar weights = mean |embedding| (reference
    'hidden_node' mode, visualize_gp.py:97-104), min-max normalized."""
    w = np.abs(node_embeddings).mean(axis=-1)
    lo, hi = w.min(), w.max()
    return (w - lo) / (hi - lo + 1e-12)


def draw_molecule(smiles: str, weights: Optional[np.ndarray] = None,
                  path: Optional[str] = None, title: str = ""):
    """Render the molecule colored by per-atom weights; returns the
    matplotlib figure (saved to ``path`` if given)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm

    mol = parse_smiles(smiles)
    pos = spring_layout(mol)
    fig, ax = plt.subplots(figsize=(5, 5))
    for b in mol.bonds:
        pa, pb = pos[b.a], pos[b.b]
        lw = 2.5 if b.order >= 2 else 1.5
        ax.plot([pa[0], pb[0]], [pa[1], pb[1]], color="0.4",
                lw=lw, zorder=1)
    w = (weights if weights is not None
         else np.zeros(mol.num_atoms(), np.float32))
    colors = cm.coolwarm(np.clip(w, 0, 1))
    ax.scatter(pos[:, 0], pos[:, 1], s=420, c=colors, zorder=2,
               edgecolors="0.2")
    for i, atom in enumerate(mol.atoms):
        ax.annotate(atom.symbol, pos[i], ha="center", va="center",
                    fontsize=9, zorder=3)
    ax.set_title(title or smiles[:50])
    ax.axis("off")
    ax.set_aspect("equal")
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return fig


class Visualizer:
    """Run a trained model over molecules and emit attention PNGs."""

    def __init__(self, trainer):
        self.trainer = trainer

    def visualize(self, smiles_list: List[str], out_dir: str) -> List[str]:
        import jax
        from ..data.batching import GraphLoader
        from ..data.datasets import MolDataset  # noqa: F401 (docs)
        from ..data.graph import GraphArrays
        from ..chem.featurize import smiles_to_arrays

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        paths = []
        model = self.trainer.model
        variables = {"params": self.trainer.state.params}
        if self.trainer.state.batch_stats:
            variables["batch_stats"] = self.trainer.state.batch_stats
        for i, smi in enumerate(smiles_list):
            x, snd, rcv, e = smiles_to_arrays(smi)
            g = GraphArrays(nodes=x, edges=e, senders=snd, receivers=rcv,
                            y=np.zeros(1, np.float32), smi=smi)
            batch = next(iter(GraphLoader([g], 1, 1)))
            _, node_steps = model.apply(variables, batch, True,
                                        return_nodes=True)
            emb = np.asarray(node_steps[-1])[:x.shape[0]]
            w = node_weights_from_embeddings(emb)
            p = str(out / f"attention_{i}.png")
            draw_molecule(smi, w, path=p)
            paths.append(p)
        return paths
