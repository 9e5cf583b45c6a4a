"""Giant-graph sharded execution must match the single-device model:
forward parity across the conv/readout family, GRADIENT parity through
the shard_map (training), and a sharded train step that learns."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.data.graph import GraphArrays
from glam_tpu.data.batching import GraphLoader
from glam_tpu.nn.model import Architecture, ModelConfig
from glam_tpu.parallel.data_parallel import make_mesh
from glam_tpu.parallel.sharded_model import (extract_params,
                                             make_sharded_forward,
                                             make_sharded_train_step,
                                             shard_inputs)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")

D = 4


def _giant_graph(seed=0, N=120, E=360):
    rng = np.random.RandomState(seed)
    nodes = rng.randn(N, 15).astype(np.float32)
    edges = rng.randn(E, 4).astype(np.float32)
    senders = rng.randint(0, N, E).astype(np.int32)
    receivers = rng.randint(0, N, E).astype(np.int32)
    return nodes, edges, senders, receivers


def _cfg(conv, readout, N, graph_norm="_None"):
    return ModelConfig(mol_block=conv, mol_readout=readout,
                       message_steps=3, e_dim=64, max_nodes=N + 8,
                       pre_norm="_None", graph_norm=graph_norm,
                       flat_norm="_None", end_norm="_None",
                       pre_do="_None()", graph_do="_None()",
                       flat_do="_None()", end_do="_None()",
                       pre_act="CELU", graph_act="CELU", flat_act="CELU")


def _single_device(conv, readout, giant, graph_norm="_None"):
    nodes, edges, senders, receivers = giant
    model = Architecture(_cfg(conv, readout, nodes.shape[0], graph_norm))
    g = GraphArrays(nodes=nodes, edges=edges, senders=senders,
                    receivers=receivers, y=np.zeros(1, np.float32))
    batch = next(iter(GraphLoader([g], 1, 1)))
    variables = model.init(jax.random.PRNGKey(0), batch, True)
    return model, batch, variables


@pytest.mark.parametrize("conv,readout", [
    ("_TripletMessage", "GlobalLAPool"),
    ("_TripletMessage", "GlobalPool5"),
    ("_TripletMessage", "Set2Set"),
    ("_GCNConv", "GlobalLAPool"),
    ("_GCNConv", "GlobalPool5"),
    ("_NNConv", "GlobalLAPool"),
    ("_GATConv", "GlobalPool5"),
    ("_TripletMessageLight", "Set2Set"),
])
def test_sharded_forward_matches_single_device(conv, readout):
    giant = _giant_graph()
    model, batch, variables = _single_device(conv, readout, giant)
    want = np.asarray(model.apply(variables, batch, True))[0]

    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_forward(mesh, message_steps=3, conv=conv,
                               readout=readout)
    params = extract_params(variables["params"], conv, readout)
    shards = shard_inputs(*giant, D)
    got = np.asarray(fwd(params, *[jnp.asarray(a) for a in shards]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("conv,readout", [
    ("_TripletMessage", "GlobalLAPool"),
    ("_GCNConv", "GlobalPool5"),
    ("_NNConv", "GlobalLAPool"),
    ("_GATConv", "GlobalPool5"),
])
def test_sharded_gradients_match_single_device(conv, readout):
    """TRAINING parity (round-2 VERDICT item 3): grads of an MSE loss
    through the sharded tower equal the single-device Architecture grads
    for every shared parameter."""
    giant = _giant_graph(seed=1)
    model, batch, variables = _single_device(conv, readout, giant)
    y = jnp.asarray([[0.7]])

    def single_loss(params):
        out = model.apply({"params": params}, batch, True)
        return jnp.mean((out[0] - y[0]) ** 2)

    ref_grads = jax.grad(single_loss)(variables["params"])
    ref = extract_params(ref_grads, conv, readout)

    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_forward(mesh, message_steps=3, conv=conv,
                               readout=readout)
    params = extract_params(variables["params"], conv, readout)
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*giant, D))

    def sharded_loss(p):
        return jnp.mean((fwd(p, *inputs) - y[0]) ** 2)

    got = jax.grad(sharded_loss)(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    for (path, r), (_, g) in zip(flat_ref, flat_got):
        # atol 5e-5: f32 summation-order noise across shards (GAT's
        # softmax denominators amplify near-zero grad elements)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("graph_norm", ["_PairNorm", "_GraphSizeNorm",
                                        "_LayerNorm"])
def test_norms_sharded_match_single_device(graph_norm):
    """Giant-graph norms: the per-graph statistics become global psum
    statistics across shards; forward parity holds."""
    giant = _giant_graph(seed=5)
    model, batch, variables = _single_device(
        "_TripletMessage", "GlobalLAPool", giant, graph_norm=graph_norm)
    want = np.asarray(model.apply(variables, batch, True))[0]
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_forward(mesh, message_steps=3,
                               graph_norm=graph_norm)
    params = extract_params(variables["params"], graph_norm=graph_norm)
    got = np.asarray(fwd(params, *[jnp.asarray(a) for a in
                                   shard_inputs(*giant, D)]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_sharded_train_then_single_device_serve():
    """Round-trip: train sharded, insert_params back, and the
    single-device Architecture reproduces the sharded prediction."""
    from glam_tpu.parallel.sharded_model import insert_params
    giant = _giant_graph(seed=3)
    model, batch, variables = _single_device("_TripletMessage",
                                             "GlobalLAPool", giant)
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    step = make_sharded_train_step(mesh, message_steps=3, lr=1e-2)
    fwd = make_sharded_forward(mesh, message_steps=3)
    params = extract_params(variables["params"])
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*giant, D))
    for _ in range(3):
        params, _ = step(params, inputs, jnp.asarray([0.4]))
    sharded_pred = float(np.asarray(fwd(params, *inputs))[0])
    merged = insert_params(variables["params"], params)
    single_pred = float(np.asarray(
        model.apply({"params": merged}, batch, True))[0, 0])
    assert abs(single_pred - sharded_pred) < 1e-4 + 1e-4 * abs(
        sharded_pred)


def test_protein_scale_contact_graph():
    """The actual scale motivation (reference src_2gi_dti_scr
    utils.py:283-293): an L~900-residue contact-map-like graph — 49-dim
    nodes, backbone chain + long-range contacts — trains sharded with
    a GCN tower and matches the single-device forward."""
    rng = np.random.RandomState(4)
    L = 900
    nodes = rng.randn(L, 49).astype(np.float32)
    bb = np.arange(L - 1)
    snd = np.concatenate([bb, bb + 1])
    rcv = np.concatenate([bb + 1, bb])
    n_contacts = 4000
    ci = rng.randint(0, L, n_contacts)
    cj = np.clip(ci + rng.randint(-60, 61, n_contacts), 0, L - 1)
    snd = np.concatenate([snd, ci, cj]).astype(np.int32)
    rcv = np.concatenate([rcv, cj, ci]).astype(np.int32)
    edges = rng.randn(len(snd), 8).astype(np.float32)

    cfg = ModelConfig(mol_block="_GCNConv", mol_readout="GlobalLAPool",
                      mol_in_dim=49, mol_edge_in_dim=8,
                      message_steps=2, e_dim=32, max_nodes=L + 8,
                      hid_dim_alpha=1,
                      pre_norm="_None", graph_norm="_None",
                      flat_norm="_None", end_norm="_None",
                      pre_do="_None()", graph_do="_None()",
                      flat_do="_None()", end_do="_None()",
                      pre_act="CELU", graph_act="CELU", flat_act="CELU")
    model = Architecture(cfg)
    g = GraphArrays(nodes=nodes, edges=edges, senders=snd,
                    receivers=rcv, y=np.zeros(1, np.float32))
    batch = next(iter(GraphLoader([g], 1, 1)))
    variables = model.init(jax.random.PRNGKey(0), batch, True)
    want = np.asarray(model.apply(variables, batch, True))[0]

    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_forward(mesh, message_steps=2, conv="_GCNConv")
    params = extract_params(variables["params"], "_GCNConv")
    inputs = tuple(jnp.asarray(a) for a in
                   shard_inputs(nodes, edges, snd, rcv, D))
    got = np.asarray(fwd(params, *inputs))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
    # halo budget sanity: contacts span +-60 residues, so the per-pair
    # boundary is far below the shard size (v2's O(H) win)
    send_idx = inputs[6]
    assert send_idx.shape[-1] < inputs[0].shape[1]  # H < Nl
    step = make_sharded_train_step(mesh, message_steps=2, lr=1e-2,
                                   conv="_GCNConv")
    params, l0 = step(params, inputs, jnp.asarray([0.2]))
    params, l1 = step(params, inputs, jnp.asarray([0.2]))
    assert np.isfinite(float(l0)) and float(l1) < float(l0)


def _pair_setup(seed=0, L=240, Ep=1200):
    rng = np.random.RandomState(seed)
    Nm, Em = 26, 60
    mol = (rng.randn(Nm, 15).astype(np.float32),
           rng.randn(Em, 4).astype(np.float32),
           rng.randint(0, Nm, Em).astype(np.int32),
           rng.randint(0, Nm, Em).astype(np.int32))
    pro = (rng.randn(L, 49).astype(np.float32),
           rng.randn(Ep, 8).astype(np.float32),
           rng.randint(0, L, Ep).astype(np.int32),
           rng.randint(0, L, Ep).astype(np.int32))
    return mol, pro


def _pair_cfg(L, mol_block="_TripletMessage", pro_block="_GCNConv",
              mol_readout="GlobalPool5", pro_readout="GlobalLAPool",
              end_act="CELU"):
    return ModelConfig(mol_block=mol_block, pro_block=pro_block,
                       mol_readout=mol_readout, pro_readout=pro_readout,
                       message_steps=2, e_dim=64, max_nodes=40,
                       pro_max_nodes=L + 8,
                       pre_norm="_None", graph_norm="_None",
                       flat_norm="_None", end_norm="_None",
                       pre_do="_None()", graph_do="_None()",
                       flat_do="_None()", end_do="_None()",
                       pre_act="CELU", graph_act="CELU",
                       flat_act="CELU", end_act=end_act)


def _pair_batches_and_model(mol, pro, cfg):
    from glam_tpu.nn.model import PairArchitecture
    model = PairArchitecture(cfg, hetero=True)
    g1 = next(iter(GraphLoader([GraphArrays(
        nodes=mol[0], edges=mol[1], senders=mol[2], receivers=mol[3],
        y=np.zeros(1, np.float32))], 1, 1)))
    g2 = next(iter(GraphLoader([GraphArrays(
        nodes=pro[0], edges=pro[1], senders=pro[2], receivers=pro[3],
        y=np.zeros(1, np.float32))], 1, 1)))
    variables = model.init(jax.random.PRNGKey(0), g1, g2, True)
    return model, g1, g2, variables


@pytest.mark.parametrize("pro_conv,pro_readout", [
    ("_GCNConv", "GlobalLAPool"),
    ("_TripletMessage", "GlobalPool5"),
])
def test_sharded_pair_forward_matches_pair_architecture(pro_conv,
                                                        pro_readout):
    """DTI two-tower sharding: replicated flax molecule tower + sharded
    protein tower + cross-shard per-step fusion equals
    PairArchitecture(hetero=True)."""
    from glam_tpu.parallel.sharded_model import (extract_pair_params,
                                                 make_sharded_pair_forward)
    mol, pro = _pair_setup()
    cfg = _pair_cfg(240, pro_block=pro_conv, pro_readout=pro_readout,
                    end_act="RReLU")
    model, g1, g2, variables = _pair_batches_and_model(mol, pro, cfg)
    want = np.asarray(model.apply(variables, g1, g2, True))[0]

    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_pair_forward(mesh, cfg)
    params = extract_pair_params(variables["params"], pro_conv,
                                 pro_readout)
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*pro, D))
    got = np.asarray(fwd(params, g1, *inputs))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_sharded_pair_gradients_match_pair_architecture():
    """Gradients through BOTH towers and the cross-shard fusion match
    the single-device PairArchitecture."""
    from glam_tpu.parallel.sharded_model import (extract_pair_params,
                                                 make_sharded_pair_forward)
    mol, pro = _pair_setup(seed=7)
    cfg = _pair_cfg(240)
    model, g1, g2, variables = _pair_batches_and_model(mol, pro, cfg)
    y = jnp.asarray(0.6)

    def single_loss(p):
        out = model.apply({"params": p}, g1, g2, True)
        return jnp.mean((out[0, 0] - y) ** 2)

    ref = extract_pair_params(jax.grad(single_loss)(variables["params"]),
                              "_GCNConv", "GlobalLAPool")

    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_pair_forward(mesh, cfg)
    params = extract_pair_params(variables["params"], "_GCNConv",
                                 "GlobalLAPool")
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*pro, D))

    def sharded_loss(p):
        return jnp.mean((fwd(p, g1, *inputs)[0] - y) ** 2)

    got = jax.grad(sharded_loss)(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    for (path, r), (_, g) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_sharded_pair_train_then_single_device_serve():
    """Round-trip: train the DTI pair model sharded, insert_pair_params
    back, and the single-device PairArchitecture reproduces the sharded
    prediction."""
    from glam_tpu.parallel.sharded_model import (
        extract_pair_params, insert_pair_params, make_sharded_pair_forward,
        make_sharded_pair_train_step)
    mol, pro = _pair_setup(seed=11)
    cfg = _pair_cfg(240)
    model, g1, g2, variables = _pair_batches_and_model(mol, pro, cfg)
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    step = make_sharded_pair_train_step(mesh, cfg, lr=1e-4)
    fwd = make_sharded_pair_forward(mesh, cfg)
    params = extract_pair_params(variables["params"], "_GCNConv",
                                 "GlobalLAPool")
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*pro, D))
    for _ in range(3):
        params, _ = step(params, g1, inputs, jnp.asarray(0.4))
    sharded_pred = float(np.asarray(fwd(params, g1, *inputs))[0])
    merged = insert_pair_params(variables["params"], params, "_GCNConv",
                                "GlobalLAPool")
    single_pred = float(np.asarray(
        model.apply({"params": merged}, g1, g2, True))[0, 0])
    assert abs(single_pred - sharded_pred) < 1e-4 + 1e-4 * abs(
        sharded_pred)


def test_sharded_pair_train_step_learns():
    from glam_tpu.parallel.sharded_model import (
        extract_pair_params, make_sharded_pair_train_step)
    mol, pro = _pair_setup(seed=9)
    cfg = _pair_cfg(240)
    _, g1, _, variables = _pair_batches_and_model(mol, pro, cfg)
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    step = make_sharded_pair_train_step(mesh, cfg, lr=1e-4)
    params = extract_pair_params(variables["params"], "_GCNConv",
                                 "GlobalLAPool")
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*pro, D))
    y = jnp.asarray(0.5)
    losses = []
    for _ in range(4):
        params, loss = step(params, g1, inputs, y)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sharded_train_step_learns():
    giant = _giant_graph(seed=2)
    _, _, variables = _single_device("_TripletMessage", "GlobalLAPool",
                                     giant)
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    step = make_sharded_train_step(mesh, message_steps=3, lr=1e-2,
                                   conv="_TripletMessage",
                                   readout="GlobalLAPool")
    params = extract_params(variables["params"])
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*giant, D))
    y = jnp.asarray([0.3])
    losses = []
    for _ in range(5):
        params, loss = step(params, inputs, y)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_batchnorm_sharded_match_single_device():
    """Sharded BatchNorm: bn_mode='batch' matches the single-device
    TRAIN-mode forward (global masked batch statistics via psum);
    bn_mode='running' matches the EVAL-mode forward on the running
    averages that train pass accumulated."""
    giant = _giant_graph(seed=7)
    model, batch, variables = _single_device(
        "_TripletMessage", "GlobalLAPool", giant, graph_norm="_BatchNorm")
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    inputs = [jnp.asarray(a) for a in shard_inputs(*giant, D)]

    want_tr, upd = model.apply(variables, batch, False,
                               mutable=["batch_stats"])
    fwd_b = make_sharded_forward(mesh, message_steps=3,
                                 graph_norm="_BatchNorm", bn_mode="batch")
    params = extract_params(variables["params"], graph_norm="_BatchNorm")
    got_tr = np.asarray(fwd_b(params, *inputs))
    np.testing.assert_allclose(got_tr, np.asarray(want_tr)[0],
                               rtol=2e-4, atol=1e-5)

    stats = upd["batch_stats"]
    want_ev = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": stats},
        batch, True))[0]
    fwd_r = make_sharded_forward(mesh, message_steps=3,
                                 graph_norm="_BatchNorm",
                                 bn_mode="running")
    params_r = extract_params(variables["params"],
                              graph_norm="_BatchNorm", batch_stats=stats)
    got_ev = np.asarray(fwd_r(params_r, *inputs))
    np.testing.assert_allclose(got_ev, want_ev, rtol=2e-4, atol=1e-5)


def test_batchnorm_sharded_grads_match_single_device():
    """Gradients through the batch statistics (mean/var differentiate,
    train-mode BatchNorm) match the single-device oracle."""
    giant = _giant_graph(seed=8)
    model, batch, variables = _single_device(
        "_TripletMessage", "GlobalLAPool", giant, graph_norm="_BatchNorm")
    y = jnp.asarray([[0.3]])
    bstats = variables["batch_stats"]

    def single_loss(params):
        out, _ = model.apply({"params": params, "batch_stats": bstats},
                             batch, False, mutable=["batch_stats"])
        return jnp.mean((out[0] - y[0]) ** 2)

    ref = extract_params(jax.grad(single_loss)(variables["params"]),
                         graph_norm="_BatchNorm")

    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_forward(mesh, message_steps=3,
                               graph_norm="_BatchNorm", bn_mode="batch")
    params = extract_params(variables["params"], graph_norm="_BatchNorm")
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*giant, D))

    def sharded_loss(p):
        return jnp.mean((fwd(p, *inputs) - y[0]) ** 2)

    got = jax.grad(sharded_loss)(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    for (path, r), (_, g) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_batchnorm_sharded_train_accumulates_running_stats():
    """make_sharded_train_step(track_bn_stats=True) applies the torch
    momentum-0.1 EMA once per message step — the updated running stats
    equal the single-device train-mode forward's mutable batch_stats,
    and the round-trip (insert_params + insert_bn_stats) serves EVAL
    single-device identically to the sharded bn_mode='running' path."""
    from glam_tpu.parallel.sharded_model import (insert_bn_stats,
                                                 insert_params)
    giant = _giant_graph(seed=9)
    model, batch, variables = _single_device(
        "_TripletMessage", "GlobalLAPool", giant, graph_norm="_BatchNorm")
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*giant, D))

    # oracle: ONE train-mode forward updates the weight-tied BatchNorm's
    # running stats once per message step (nn/norms.py EMA x3)
    _, upd = model.apply(variables, batch, False,
                         mutable=["batch_stats"])
    want = upd["batch_stats"]["mol"]["conv"]["BatchNorm_0"]

    params = extract_params(variables["params"],
                            graph_norm="_BatchNorm",
                            batch_stats=variables["batch_stats"])
    step = make_sharded_train_step(
        mesh, message_steps=3, lr=1e-3, track_bn_stats=True,
        conv="_TripletMessage", readout="GlobalLAPool",
        graph_norm="_BatchNorm")
    params2, loss = step(params, inputs, jnp.asarray(0.4))
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(params2["norm_ra"]["mean"]),
                               np.asarray(want["mean"]),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(params2["norm_ra"]["var"]),
                               np.asarray(want["var"]),
                               rtol=2e-4, atol=1e-5)

    # round-trip: sharded-trained params + accumulated stats serve EVAL
    # single-device == sharded running-mode forward
    fwd_r = make_sharded_forward(mesh, message_steps=3,
                                 graph_norm="_BatchNorm",
                                 bn_mode="running")
    sharded_ev = float(np.asarray(fwd_r(params2, *inputs))[0])
    merged = insert_params(variables["params"], params2,
                           graph_norm="_BatchNorm")
    stats = insert_bn_stats(variables["batch_stats"], params2)
    single_ev = float(np.asarray(model.apply(
        {"params": merged, "batch_stats": stats}, batch, True))[0, 0])
    assert abs(single_ev - sharded_ev) < 1e-4 + 1e-4 * abs(sharded_ev)


class TestShardedStochastic:
    """Stochastic TRAINING regularization in the sharded tower:
    MessageBlock graph-dropout + train-mode RReLU, noise drawn over the
    GLOBAL node index space (make_stochastic_inputs) so training is
    bit-identical at any shard count."""

    def _fwd(self, n_parts, giant, variables, key, rate,
             graph_act="RReLU"):
        from glam_tpu.parallel.sharded_model import make_stochastic_inputs
        nodes = giant[0]
        mesh = make_mesh(jax.devices()[:n_parts], ("graph",))
        fwd = make_sharded_forward(mesh, message_steps=3,
                                   conv="_TripletMessage",
                                   readout="GlobalPool5",
                                   graph_act=graph_act,
                                   stochastic=True)
        params = extract_params(variables["params"], "_TripletMessage",
                                "GlobalPool5")
        shards = [jnp.asarray(a) for a in shard_inputs(*giant, n_parts)]
        drop, slope = make_stochastic_inputs(
            key, nodes.shape[0], 60, 3, n_parts, rate)
        return np.asarray(fwd(params, *shards, jnp.asarray(drop),
                              jnp.asarray(slope)))

    def test_shard_count_invariant(self):
        """Same PRNG key => same prediction at D=1, 2, 4."""
        giant = _giant_graph(seed=5)
        _, _, variables = _single_device("_TripletMessage",
                                         "GlobalPool5", giant)
        # graph_act RReLU in _cfg? _cfg uses CELU; the sharded fwd's
        # graph_act is set independently of the flax init (same params).
        key = jax.random.PRNGKey(42)
        outs = [self._fwd(d, giant, variables, key, rate=0.3)
                for d in (1, 2, 4)]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-4,
                                   atol=1e-5)

    def test_rate0_celu_matches_deterministic(self):
        """rate=0 + non-RReLU act: the stochastic path is exactly the
        deterministic forward (all-ones keep mask, slopes ignored)."""
        giant = _giant_graph(seed=6)
        _, _, variables = _single_device("_TripletMessage",
                                         "GlobalPool5", giant)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        det = make_sharded_forward(mesh, message_steps=3,
                                   conv="_TripletMessage",
                                   readout="GlobalPool5")
        params = extract_params(variables["params"], "_TripletMessage",
                                "GlobalPool5")
        shards = [jnp.asarray(a) for a in shard_inputs(*giant, D)]
        want = np.asarray(det(params, *shards))
        got = self._fwd(D, giant, variables, jax.random.PRNGKey(7),
                        rate=0.0, graph_act="CELU")
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_mean_slope_matches_eval_rrelu(self):
        """Injecting the constant eval slope (l+u)/2 reproduces the
        deterministic RReLU forward exactly — the train-mode slope path
        is wired through the same math."""
        from glam_tpu.nn.activations import RRELU_LOWER, RRELU_UPPER
        from glam_tpu.parallel.sharded_model import make_stochastic_inputs
        giant = _giant_graph(seed=7)
        _, _, variables = _single_device("_TripletMessage",
                                         "GlobalPool5", giant)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        det = make_sharded_forward(mesh, message_steps=3,
                                   conv="_TripletMessage",
                                   readout="GlobalPool5",
                                   graph_act="RReLU")
        sto = make_sharded_forward(mesh, message_steps=3,
                                   conv="_TripletMessage",
                                   readout="GlobalPool5",
                                   graph_act="RReLU", stochastic=True)
        params = extract_params(variables["params"], "_TripletMessage",
                                "GlobalPool5")
        shards = [jnp.asarray(a) for a in shard_inputs(*giant, D)]
        want = np.asarray(det(params, *shards))
        drop, slope = make_stochastic_inputs(
            jax.random.PRNGKey(0), giant[0].shape[0], 60, 3, D,
            rate=0.0)
        slope = np.full_like(slope, (RRELU_LOWER + RRELU_UPPER) / 2.0)
        got = np.asarray(sto(params, *shards, jnp.asarray(drop),
                             jnp.asarray(slope)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_noise_statistics(self):
        from glam_tpu.nn.activations import RRELU_LOWER, RRELU_UPPER
        from glam_tpu.parallel.sharded_model import make_stochastic_inputs
        drop, slope = make_stochastic_inputs(
            jax.random.PRNGKey(3), 120, 60, 3, 4, rate=0.25)
        assert drop.shape == (4, 3, 32, 60)       # Nl = ceil(120/4)->32
        # undo the shard layout: [D,S,Nl,C] -> [S, D*Nl, C]; the global
        # tail [120:128) is padding (keep=1, mean slope)
        g = drop.transpose(1, 0, 2, 3).reshape(3, 128, 60)
        real = g[:, :120]
        assert set(np.unique(real)) <= {np.float32(0.0),
                                        np.float32(1.0 / 0.75)}
        frac = float((real == 0).mean())
        assert 0.22 < frac < 0.28                 # ~ rate = 0.25
        np.testing.assert_array_equal(g[:, 120:], 1.0)
        sg = slope.transpose(1, 0, 2, 3).reshape(3, 128, 60)
        assert sg[:, :120].min() >= RRELU_LOWER
        assert sg[:, :120].max() <= RRELU_UPPER
        np.testing.assert_allclose(sg[:, 120:],
                                   (RRELU_LOWER + RRELU_UPPER) / 2.0)

    def test_stochastic_train_step_learns(self):
        """Full fwd+bwd with dropout + train-RReLU noise, fresh draw per
        step (flax training semantics), loss decreases."""
        from glam_tpu.parallel.sharded_model import (
            make_sharded_train_step, make_stochastic_inputs)
        giant = _giant_graph(seed=8)
        _, _, variables = _single_device("_TripletMessage",
                                         "GlobalLAPool", giant)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        step = make_sharded_train_step(mesh, message_steps=3, lr=1e-2,
                                       conv="_TripletMessage",
                                       readout="GlobalLAPool",
                                       graph_act="RReLU",
                                       stochastic=True)
        params = extract_params(variables["params"])
        shards = tuple(jnp.asarray(a) for a in shard_inputs(*giant, D))
        y = jnp.asarray([0.3])
        key = jax.random.PRNGKey(11)
        losses = []
        for i in range(6):
            key, sub = jax.random.split(key)
            drop, slope = make_stochastic_inputs(
                sub, giant[0].shape[0], 60, 3, D, rate=0.2)
            inputs = shards + (jnp.asarray(drop), jnp.asarray(slope))
            params, loss = step(params, inputs, y)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestShardedPairStochastic:
    """stochastic=True on the hetero-pair (DTI) path: replicated flax
    molecule tower draws its own flax 'dropout' stream (outside the
    shard_map => shard-count independent); the sharded protein tower
    consumes make_stochastic_inputs noise."""

    def _stoch_cfg(self, L):
        import dataclasses
        return dataclasses.replace(
            _pair_cfg(L), graph_do="Dropout(0.3)", graph_act="RReLU")

    def _run(self, n_parts, mol, pro, cfg, variables, key):
        from glam_tpu.parallel.sharded_model import (
            extract_pair_params, make_sharded_pair_forward,
            make_stochastic_inputs)
        _, g1, _, _ = _pair_batches_and_model(mol, pro, cfg)
        mesh = make_mesh(jax.devices()[:n_parts], ("graph",))
        fwd = make_sharded_pair_forward(mesh, cfg, stochastic=True)
        params = extract_pair_params(variables["params"], "_GCNConv",
                                     "GlobalLAPool")
        shards = [jnp.asarray(a) for a in shard_inputs(*pro, n_parts)]
        k_mol, k_pro = jax.random.split(key)
        drop, slope = make_stochastic_inputs(
            k_pro, pro[0].shape[0], cfg.hid_dim, cfg.message_steps,
            n_parts, rate=0.3)
        return np.asarray(fwd(params, g1, k_mol, *shards,
                              jnp.asarray(drop), jnp.asarray(slope)))

    def test_pair_shard_count_invariant(self):
        mol, pro = _pair_setup(seed=21)
        cfg = self._stoch_cfg(240)
        _, _, _, variables = _pair_batches_and_model(mol, pro, cfg)
        key = jax.random.PRNGKey(5)
        o2 = self._run(2, mol, pro, cfg, variables, key)
        o4 = self._run(4, mol, pro, cfg, variables, key)
        np.testing.assert_allclose(o2, o4, rtol=1e-4, atol=1e-5)

    def test_pair_rate0_celu_matches_deterministic(self):
        from glam_tpu.parallel.sharded_model import (
            extract_pair_params, make_sharded_pair_forward,
            make_stochastic_inputs)
        mol, pro = _pair_setup(seed=22)
        cfg = _pair_cfg(240)          # all CELU, all dropouts _None()
        _, g1, _, variables = _pair_batches_and_model(mol, pro, cfg)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        det = make_sharded_pair_forward(mesh, cfg)
        sto = make_sharded_pair_forward(mesh, cfg, stochastic=True)
        params = extract_pair_params(variables["params"], "_GCNConv",
                                     "GlobalLAPool")
        shards = [jnp.asarray(a) for a in shard_inputs(*pro, D)]
        want = np.asarray(det(params, g1, *shards))
        drop, slope = make_stochastic_inputs(
            jax.random.PRNGKey(1), pro[0].shape[0], cfg.hid_dim,
            cfg.message_steps, D, rate=0.0)
        got = np.asarray(sto(params, g1, jax.random.PRNGKey(2), *shards,
                             jnp.asarray(drop), jnp.asarray(slope)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_pair_stochastic_train_learns(self):
        from glam_tpu.parallel.sharded_model import (
            extract_pair_params, make_sharded_pair_train_step,
            make_stochastic_inputs)
        mol, pro = _pair_setup(seed=23)
        cfg = self._stoch_cfg(240)
        _, g1, _, variables = _pair_batches_and_model(mol, pro, cfg)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        step = make_sharded_pair_train_step(mesh, cfg, lr=3e-4,
                                            stochastic=True)
        params = extract_pair_params(variables["params"], "_GCNConv",
                                     "GlobalLAPool")
        shards = tuple(jnp.asarray(a) for a in shard_inputs(*pro, D))
        y = jnp.asarray(0.5)
        key = jax.random.PRNGKey(9)
        losses = []
        for _ in range(6):
            key, k_mol, k_pro = jax.random.split(key, 3)
            drop, slope = make_stochastic_inputs(
                k_pro, pro[0].shape[0], cfg.hid_dim, cfg.message_steps,
                D, rate=0.3)
            inputs = (k_mol,) + shards + (jnp.asarray(drop),
                                          jnp.asarray(slope))
            params, loss = step(params, g1, inputs, y)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


def _to_dev(a):
    if isinstance(a, tuple):
        return tuple(jnp.asarray(x) for x in a)
    return jnp.asarray(a)


def _banded_giant(seed=0, N=120, E=360, band=20):
    """Contact-map-like giant graph: |snd - rcv| <= band, so the ring
    halo plan's distance-1 sections carry nearly all the traffic."""
    rng = np.random.RandomState(seed)
    nodes = rng.randn(N, 15).astype(np.float32)
    edges = rng.randn(E, 4).astype(np.float32)
    snd = rng.randint(0, N, E).astype(np.int32)
    rcv = np.clip(snd + rng.randint(-band, band + 1, E),
                  0, N - 1).astype(np.int32)
    return nodes, edges, snd, rcv


class TestRingHalo:
    """v3 ring-compacted halo exchange: per-distance ppermute budgets
    instead of the v2 all_to_all's single global budget — same math,
    fewer ICI bytes on banded graphs (build_halo_exchange_ring)."""

    @pytest.mark.parametrize("conv,readout", [
        ("_TripletMessage", "GlobalLAPool"),
        ("_GCNConv", "GlobalPool5"),
        ("_GATConv", "GlobalPool5"),
    ])
    def test_ring_forward_matches_single_device(self, conv, readout):
        giant = _banded_giant(seed=31)
        model, batch, variables = _single_device(conv, readout, giant)
        want = np.asarray(model.apply(variables, batch, True))[0]
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        fwd = make_sharded_forward(mesh, message_steps=3, conv=conv,
                                   readout=readout)
        params = extract_params(variables["params"], conv, readout)
        shards = [_to_dev(a) for a in shard_inputs(*giant, D,
                                                   halo="ring")]
        got = np.asarray(fwd(params, *shards))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_ring_equals_a2a_on_random_graph(self):
        """Non-banded graph (every shard pair talks): both plans hit
        the same forward value."""
        giant = _giant_graph(seed=32)
        _, _, variables = _single_device("_TripletMessage",
                                         "GlobalLAPool", giant)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        fwd = make_sharded_forward(mesh, message_steps=3,
                                   conv="_TripletMessage",
                                   readout="GlobalLAPool")
        params = extract_params(variables["params"])
        a = np.asarray(fwd(params, *[_to_dev(x) for x in
                                     shard_inputs(*giant, D)]))
        b = np.asarray(fwd(params, *[_to_dev(x) for x in
                                     shard_inputs(*giant, D,
                                                  halo="ring")]))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_ring_gradients_match_single_device(self):
        """ppermute differentiates to the inverse permutation; full
        fwd+bwd gradient parity vs the flax Architecture (compared over
        the extracted shared-parameter subtree, like the v2 test)."""
        giant = _banded_giant(seed=33)
        model, batch, variables = _single_device("_TripletMessage",
                                                 "GlobalLAPool", giant)
        y = jnp.asarray([[0.7]])

        def single_loss(p):
            out = model.apply({"params": p}, batch, True)
            return jnp.mean((out[0] - y[0]) ** 2)

        ref = extract_params(jax.grad(single_loss)(variables["params"]))
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        fwd = make_sharded_forward(mesh, message_steps=3,
                                   conv="_TripletMessage",
                                   readout="GlobalLAPool")
        params = extract_params(variables["params"])
        shards = [_to_dev(a) for a in shard_inputs(*giant, D,
                                                   halo="ring")]

        def sharded_loss(p):
            return jnp.mean((fwd(p, *shards) - y[0]) ** 2)

        got = jax.grad(sharded_loss)(params)
        flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
        flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
        for (path, r), (_, g) in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-4, atol=5e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_ring_budget_compaction(self):
        """On a banded graph the ring plan ships far fewer rows than the
        v2 all_to_all budget D*H."""
        from glam_tpu.parallel.graph_partition import (
            build_halo_exchange, build_halo_exchange_ring,
            split_large_graph)
        giant = _banded_giant(seed=34, N=240, E=960, band=16)
        nsh, esh, sg, rl, emask = split_large_graph(*giant, 8)
        Nl = nsh.shape[1]
        _, _, _, H = build_halo_exchange(sg, emask, Nl)
        _, budgets, _ = build_halo_exchange_ring(sg, emask, Nl)
        v2_rows = 8 * H              # per shard per step
        v3_rows = sum(budgets)
        assert v3_rows < v2_rows / 2
        # distant sections must be empty on a banded graph
        assert budgets[3] == 0 or budgets[3] <= 8


def test_everything_on_sharded_training_roundtrip():
    """Integration: ring halo + stochastic regularization (dropout +
    train RReLU) + BatchNorm with running-stat accumulation, trained
    together on a banded giant graph, then served single-device via
    insert_params/insert_bn_stats — finite losses that decrease, and
    the round-tripped model agrees with the sharded running-mode eval."""
    from glam_tpu.parallel.sharded_model import (
        insert_bn_stats, insert_params, make_sharded_train_step,
        make_stochastic_inputs)
    giant = _banded_giant(seed=41)
    model, batch, variables = _single_device(
        "_TripletMessage", "GlobalLAPool", giant,
        graph_norm="_BatchNorm")
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    inputs = tuple(_to_dev(a) for a in shard_inputs(*giant, D,
                                                    halo="ring"))
    params = extract_params(variables["params"],
                            graph_norm="_BatchNorm",
                            batch_stats=variables["batch_stats"])
    step = make_sharded_train_step(
        mesh, message_steps=3, lr=1e-2, track_bn_stats=True,
        conv="_TripletMessage", readout="GlobalLAPool",
        graph_norm="_BatchNorm", stochastic=True)
    key = jax.random.PRNGKey(17)
    losses = []
    for _ in range(5):
        key, sub = jax.random.split(key)
        drop, slope = make_stochastic_inputs(
            sub, giant[0].shape[0], 60, 3, D, rate=0.2)
        params, loss = step(params, inputs + (jnp.asarray(drop),
                                              jnp.asarray(slope)),
                            jnp.asarray([0.4]))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # serve single-device in EVAL mode == sharded running-mode forward
    fwd_r = make_sharded_forward(mesh, message_steps=3,
                                 conv="_TripletMessage",
                                 readout="GlobalLAPool",
                                 graph_norm="_BatchNorm",
                                 bn_mode="running")
    sharded_ev = float(np.asarray(fwd_r(params, *inputs))[0])
    merged = insert_params(variables["params"], params,
                           graph_norm="_BatchNorm")
    stats = insert_bn_stats(variables["batch_stats"], params)
    single_ev = float(np.asarray(model.apply(
        {"params": merged, "batch_stats": stats}, batch, True))[0, 0])
    assert abs(single_ev - sharded_ev) < 1e-4 + 1e-4 * abs(sharded_ev)


def test_halo_auto_picks_cheaper_plan():
    """halo='auto': banded graphs get the ring plan (tuple send_idx),
    dense random graphs keep the single all_to_all (array send_idx);
    both forwards match the single-device value."""
    banded = _banded_giant(seed=51)
    dense = _giant_graph(seed=52)
    sb = shard_inputs(*banded, 8, halo="auto")
    sd = shard_inputs(*dense, 4, halo="auto")
    assert isinstance(sb[6], tuple)         # ring won on the band
    # dense random graph: every pair talks, the ring saving (only the
    # padded self-distance) is under the 2x threshold -> a2a retained,
    # one collective instead of D-1 sequential permutes
    assert not isinstance(sd[6], tuple)
    _, _, variables = _single_device("_TripletMessage",
                                     "GlobalLAPool", banded)
    model, batch, _ = _single_device("_TripletMessage", "GlobalLAPool",
                                     banded)
    want = np.asarray(model.apply(variables, batch, True))[0]
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_forward(mesh, message_steps=3,
                               conv="_TripletMessage",
                               readout="GlobalLAPool")
    params = extract_params(variables["params"])
    got = np.asarray(fwd(params, *[_to_dev(a) for a in
                                   shard_inputs(*banded, D,
                                                halo="auto")]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ring_halo_pair_forward():
    """Ring-compacted halo on the sharded PROTEIN tower of the
    hetero-pair path matches the PairArchitecture oracle."""
    from glam_tpu.parallel.sharded_model import (
        extract_pair_params, make_sharded_pair_forward)
    mol, pro = _pair_setup(seed=61)
    cfg = _pair_cfg(240)
    model, g1, g2, variables = _pair_batches_and_model(mol, pro, cfg)
    want = float(np.asarray(model.apply(variables, g1, g2, True))[0, 0])
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_pair_forward(mesh, cfg)
    params = extract_pair_params(variables["params"], "_GCNConv",
                                 "GlobalLAPool")
    shards = [_to_dev(a) for a in shard_inputs(*pro, D, halo="ring")]
    got = float(np.asarray(fwd(params, g1, *shards))[0])
    assert abs(got - want) < 1e-4 + 1e-4 * abs(want), (got, want)


def test_track_bn_stats_requires_norm_ra_eagerly():
    """Missing running-stats tree raises a clear ValueError before the
    jitted step traces (not a KeyError from inside jit)."""
    from glam_tpu.parallel.sharded_model import make_sharded_train_step
    giant = _giant_graph(seed=71)
    _, _, variables = _single_device("_TripletMessage", "GlobalLAPool",
                                     giant, graph_norm="_BatchNorm")
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    step = make_sharded_train_step(
        mesh, message_steps=3, lr=1e-3, track_bn_stats=True,
        conv="_TripletMessage", readout="GlobalLAPool",
        graph_norm="_BatchNorm")
    params = extract_params(variables["params"],
                            graph_norm="_BatchNorm")  # no batch_stats!
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*giant, D))
    with pytest.raises(ValueError, match="norm_ra"):
        step(params, inputs, jnp.asarray(0.4))


# ---------------------------------------------------------------------------
# Batched sharded pair regime (n_pairs = B > 1, VERDICT round-3 item 1)
# ---------------------------------------------------------------------------

def _stack_pro_inputs(pros, D, halo="a2a"):
    """Shard B proteins at SHARED corpus budgets (the trainer's
    two-pass planning, sharded_pair_trainer._plan_pro_budgets) and
    stack leaf-wise to [B, D, ...]."""
    from glam_tpu.parallel.graph_partition import (build_halo_exchange,
                                                   build_halo_exchange_ring,
                                                   split_large_graph)
    nb = max(p[0].shape[0] for p in pros)
    eb, hb = 0, 0
    ring = None
    for p in pros:
        nsh, esh, sg, rl, em = split_large_graph(*p, D, node_budget=nb)
        eb = max(eb, esh.shape[1])
        if halo == "ring":
            _, budgets, _ = build_halo_exchange_ring(sg, em, nsh.shape[1])
            ring = budgets if ring is None else [
                max(a, b) for a, b in zip(ring, budgets)]
        else:
            _, _, _, H = build_halo_exchange(sg, em, nsh.shape[1])
            hb = max(hb, H)
    per = []
    for p in pros:
        kw = dict(node_budget=nb, edge_budget=eb)
        if halo == "ring":
            kw.update(halo="ring", ring_budgets=ring)
        else:
            kw.update(halo_budget=hb)
        per.append(tuple(
            tuple(jnp.asarray(x) for x in a) if isinstance(a, tuple)
            else jnp.asarray(a) for a in shard_inputs(*p, D, **kw)))
    return tuple(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per))


class TestBatchedPairForward:
    B = 3

    def _setup(self, halo="a2a"):
        from glam_tpu.parallel.sharded_model import (
            extract_pair_params, make_sharded_pair_forward)
        mols, pros, g1s = [], [], []
        cfg = _pair_cfg(240)
        for b in range(self.B):
            mol, pro = _pair_setup(seed=10 + b)
            mols.append(mol)
            pros.append(pro)
        model, g1, g2, variables = _pair_batches_and_model(
            mols[0], pros[0], cfg)
        for mol in mols:
            g1s.append(next(iter(GraphLoader([GraphArrays(
                nodes=mol[0], edges=mol[1], senders=mol[2],
                receivers=mol[3], y=np.zeros(1, np.float32))], 1, 1))))
        params = extract_pair_params(variables["params"], "_GCNConv",
                                     "GlobalLAPool")
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        stacked_mols = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *g1s)
        stacked_pro = _stack_pro_inputs(pros, D, halo=halo)
        fwd_b = make_sharded_pair_forward(mesh, cfg, n_pairs=self.B)
        fwd_1 = make_sharded_pair_forward(mesh, cfg)
        return (params, mesh, cfg, g1s, pros, stacked_mols, stacked_pro,
                fwd_b, fwd_1)

    def test_rows_match_unbatched(self):
        (params, mesh, cfg, g1s, pros, sm, sp, fwd_b, fwd_1) = \
            self._setup()
        got = np.asarray(fwd_b(params, sm, *sp))
        assert got.shape[0] == self.B
        for b in range(self.B):
            per = tuple(jax.tree_util.tree_map(lambda x: x[b], sp))
            want = np.asarray(fwd_1(params, g1s[b], *per))
            np.testing.assert_allclose(got[b], want, rtol=1e-5,
                                       atol=1e-6)

    def test_ring_halo_batched(self):
        (params, _, _, g1s, pros, sm, _, fwd_b, _) = self._setup()
        sp_ring = _stack_pro_inputs(pros, D, halo="ring")
        sp_a2a = _stack_pro_inputs(pros, D, halo="a2a")
        a = np.asarray(fwd_b(params, sm, *sp_a2a))
        r = np.asarray(fwd_b(params, sm, *sp_ring))
        np.testing.assert_allclose(r, a, rtol=1e-5, atol=1e-6)

    def test_batched_grads_are_mean_of_per_pair(self):
        (params, mesh, cfg, g1s, pros, sm, sp, fwd_b, fwd_1) = \
            self._setup()
        ys = jnp.asarray([0.2, 0.7, -0.4])

        def batched_loss(p):
            out = fwd_b(p, sm, *sp)[:, 0]
            return jnp.mean((out - ys) ** 2)

        got = jax.grad(batched_loss)(params)

        def pair_loss(p, b):
            per = tuple(jax.tree_util.tree_map(lambda x: x[b], sp))
            return (fwd_1(p, g1s[b], *per)[0] - ys[b]) ** 2

        refs = [jax.grad(lambda p, b=b: pair_loss(p, b))(params)
                for b in range(self.B)]
        ref = jax.tree_util.tree_map(
            lambda *xs: sum(xs) / self.B, *refs)
        flat_ref = jax.tree_util.tree_flatten_with_path(ref)[0]
        flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
        for (path, r), (_, g) in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-4, atol=5e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_stochastic_rate0_matches_deterministic(self):
        from glam_tpu.parallel.sharded_model import (
            extract_pair_params, make_sharded_pair_forward,
            make_stochastic_inputs)
        (params, mesh, cfg, g1s, pros, sm, sp, fwd_b, _) = self._setup()
        fwd_s = make_sharded_pair_forward(mesh, cfg, stochastic=True,
                                          n_pairs=self.B)
        n_global = sp[0].shape[1] * sp[0].shape[2]  # D * Nl
        key = jax.random.PRNGKey(3)
        drops, slopes = [], []
        for b in range(self.B):
            d, s = make_stochastic_inputs(
                jax.random.fold_in(key, b), n_global, cfg.hid_dim,
                cfg.message_steps, D, rate=0.0)
            drops.append(d)
            slopes.append(s)
        mol_rngs = jax.random.split(jax.random.PRNGKey(9), self.B)
        got = np.asarray(fwd_s(params, sm, mol_rngs, *sp,
                               jnp.stack([jnp.asarray(d) for d in drops]),
                               jnp.stack([jnp.asarray(s) for s in slopes])))
        want = np.asarray(fwd_b(params, sm, *sp))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestBatchNormPair:
    """graph_norm='_BatchNorm' on the SHARDED PAIR path (round 4,
    VERDICT item 5): psum batch statistics in the protein tower +
    mutable flax stats in the molecule tower; torch momentum-0.1 EMA
    reproduces the dense PairArchitecture's running statistics
    exactly, and eval with running averages matches dense eval."""

    def _setup(self):
        from glam_tpu.parallel.sharded_model import extract_pair_params
        mol, pro = _pair_setup(seed=1)
        cfg = _pair_cfg(240)
        cfg = type(cfg)(**{**cfg.__dict__, "graph_norm": "_BatchNorm"})
        model, g1, g2, variables = _pair_batches_and_model(mol, pro, cfg)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        inputs = tuple(jnp.asarray(a) for a in shard_inputs(*pro, D))
        return model, g1, g2, variables, cfg, mesh, inputs

    def test_train_forward_and_stats_match_dense(self):
        from glam_tpu.parallel.sharded_model import (
            extract_pair_params, make_sharded_pair_forward,
            make_stochastic_inputs)
        model, g1, g2, variables, cfg, mesh, inputs = self._setup()
        out_d, upd = model.apply(variables, g1, g2, False,
                                 rngs={"dropout": jax.random.PRNGKey(5)},
                                 mutable=["batch_stats"])
        dense_stats = upd["batch_stats"]
        params = extract_pair_params(variables["params"], "_GCNConv",
                                     "GlobalLAPool",
                                     graph_norm="_BatchNorm")
        fwd_t = make_sharded_pair_forward(mesh, cfg, stochastic=True,
                                          track_bn_stats=True)
        n_global = inputs[0].shape[0] * inputs[0].shape[1]
        drop, slope = make_stochastic_inputs(
            jax.random.PRNGKey(7), n_global, cfg.hid_dim,
            cfg.message_steps, D, rate=0.0)
        bn0 = variables["batch_stats"]
        pred, new_bn, (pm, pv) = fwd_t(
            params, g1, bn0["mol1"], jax.random.PRNGKey(5), *inputs,
            jnp.asarray(drop), jnp.asarray(slope))
        np.testing.assert_allclose(np.asarray(pred),
                                   np.asarray(out_d)[0],
                                   rtol=2e-4, atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(new_bn["conv"]["BatchNorm_0"][k]),
                np.asarray(dense_stats["mol1"]["conv"]
                           ["BatchNorm_0"][k]), rtol=1e-4, atol=1e-6)
        # protein tower: EMA over per-step stats == dense weight-tied
        # BatchNorm's sequential updates
        mean = np.asarray(bn0["mol2"]["conv"]["BatchNorm_0"]["mean"])
        var = np.asarray(bn0["mol2"]["conv"]["BatchNorm_0"]["var"])
        pm, pv = np.asarray(pm), np.asarray(pv)
        for s in range(pm.shape[0]):
            mean = 0.9 * mean + 0.1 * pm[s]
            var = 0.9 * var + 0.1 * pv[s]
        ref = dense_stats["mol2"]["conv"]["BatchNorm_0"]
        np.testing.assert_allclose(mean, np.asarray(ref["mean"]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(var, np.asarray(ref["var"]),
                                   rtol=1e-4, atol=1e-6)

    def test_eval_running_matches_dense_eval(self):
        from glam_tpu.parallel.sharded_model import (
            extract_pair_params, make_sharded_pair_forward)
        model, g1, g2, variables, cfg, mesh, inputs = self._setup()
        # advance the stats once so running averages are non-trivial
        _, upd = model.apply(variables, g1, g2, False,
                             rngs={"dropout": jax.random.PRNGKey(5)},
                             mutable=["batch_stats"])
        stats = upd["batch_stats"]
        want = np.asarray(model.apply(
            {"params": variables["params"], "batch_stats": stats},
            g1, g2, True))[0]
        params = extract_pair_params(variables["params"], "_GCNConv",
                                     "GlobalLAPool",
                                     graph_norm="_BatchNorm",
                                     batch_stats=stats)
        fwd_e = make_sharded_pair_forward(mesh, cfg, bn_mode="running")
        got = np.asarray(fwd_e(params, g1, stats["mol1"], *inputs))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


class TestBatchNormPairBatched:
    """BatchNorm with pair_batch B>1 (ADVICE round-4 medium): the
    batched sharded train forward computes JOINT cross-pair batch
    statistics in BOTH towers, matching the dense PairArchitecture
    applied to the PACKED B-pair batch (the reference batch-loop
    semantics) — not per-pair statistics."""
    B = 3

    def _setup(self, n_real=None):
        from glam_tpu.parallel.sharded_model import extract_pair_params
        n_real = n_real or self.B
        cfg = _pair_cfg(240)
        cfg = type(cfg)(**{**cfg.__dict__, "graph_norm": "_BatchNorm"})
        mols, pros = [], []
        for b in range(n_real):
            mol, pro = _pair_setup(seed=20 + b)
            mols.append(mol)
            pros.append(pro)
        # weight-0 padding repeats of the last real pair (trainer's
        # _collate convention) fill the chunk up to B
        w = [1.0] * n_real + [0.0] * (self.B - n_real)
        mols += [mols[-1]] * (self.B - n_real)
        pros += [pros[-1]] * (self.B - n_real)
        model, g1, g2, variables = _pair_batches_and_model(
            mols[0], pros[0], cfg)
        g1s = [next(iter(GraphLoader([GraphArrays(
            nodes=m[0], edges=m[1], senders=m[2], receivers=m[3],
            y=np.zeros(1, np.float32))], 1, 1))) for m in mols]
        stacked_mols = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *g1s)
        stacked_pro = _stack_pro_inputs(pros, D)
        # dense packed batches over the REAL pairs only
        packed1 = next(iter(GraphLoader([GraphArrays(
            nodes=m[0], edges=m[1], senders=m[2], receivers=m[3],
            y=np.zeros(1, np.float32)) for m in mols[:n_real]],
            n_real, 1)))
        packed2 = next(iter(GraphLoader([GraphArrays(
            nodes=p[0], edges=p[1], senders=p[2], receivers=p[3],
            y=np.zeros(1, np.float32)) for p in pros[:n_real]],
            n_real, 1)))
        params = extract_pair_params(variables["params"], "_GCNConv",
                                     "GlobalLAPool",
                                     graph_norm="_BatchNorm")
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        return (model, variables, cfg, mesh, params, stacked_mols,
                stacked_pro, packed1, packed2,
                jnp.asarray(w, jnp.float32), n_real)

    def _run_batched(self, mesh, cfg, params, bn0, sm, sp, w):
        from glam_tpu.parallel.sharded_model import (
            make_sharded_pair_forward, make_stochastic_inputs)
        fwd_t = make_sharded_pair_forward(mesh, cfg, stochastic=True,
                                          track_bn_stats=True,
                                          n_pairs=self.B)
        n_global = sp[0].shape[1] * sp[0].shape[2]  # D * Nl
        drops, slopes = [], []
        for b in range(self.B):
            d, s = make_stochastic_inputs(
                jax.random.fold_in(jax.random.PRNGKey(3), b), n_global,
                cfg.hid_dim, cfg.message_steps, D, rate=0.0)
            drops.append(jnp.asarray(d))
            slopes.append(jnp.asarray(s))
        mol_rngs = jax.random.split(jax.random.PRNGKey(9), self.B)
        return fwd_t(params, sm, bn0["mol1"], w, mol_rngs, *sp,
                     jnp.stack(drops), jnp.stack(slopes))

    def _check(self, n_real):
        (model, variables, cfg, mesh, params, sm, sp, packed1, packed2,
         w, n_real) = self._setup(n_real)
        out_d, upd = model.apply(variables, packed1, packed2, False,
                                 rngs={"dropout": jax.random.PRNGKey(5)},
                                 mutable=["batch_stats"])
        dense_stats = upd["batch_stats"]
        bn0 = variables["batch_stats"]
        pred, new_bn, (pm, pv) = self._run_batched(
            mesh, cfg, params, bn0, sm, sp, w)
        # real rows match the dense packed-batch rows (JOINT statistics)
        np.testing.assert_allclose(
            np.asarray(pred)[:n_real, 0], np.asarray(out_d)[:n_real, 0],
            rtol=5e-4, atol=1e-5)
        # molecule-tower EMA stats: every per-pair row equals the dense
        # single update (identical joint statistics)
        got_bn = jax.tree_util.tree_map(lambda x: x[0], new_bn)
        for k in ("mean", "var"):
            ref = np.asarray(
                dense_stats["mol1"]["conv"]["BatchNorm_0"][k])
            for b in range(self.B):
                np.testing.assert_allclose(
                    np.asarray(new_bn["conv"]["BatchNorm_0"][k][b]),
                    ref, rtol=2e-4, atol=1e-6)
        # protein-tower EMA == dense weight-tied sequential updates
        mean = np.asarray(bn0["mol2"]["conv"]["BatchNorm_0"]["mean"])
        var = np.asarray(bn0["mol2"]["conv"]["BatchNorm_0"]["var"])
        pm0, pv0 = np.asarray(pm)[0], np.asarray(pv)[0]
        for b in range(self.B):  # identical across pairs
            np.testing.assert_allclose(np.asarray(pm)[b], pm0,
                                       rtol=1e-5, atol=1e-7)
        for s in range(pm0.shape[0]):
            mean = 0.9 * mean + 0.1 * pm0[s]
            var = 0.9 * var + 0.1 * pv0[s]
        ref = dense_stats["mol2"]["conv"]["BatchNorm_0"]
        np.testing.assert_allclose(mean, np.asarray(ref["mean"]),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(var, np.asarray(ref["var"]),
                                   rtol=2e-4, atol=1e-6)

    def test_full_chunk_matches_dense_packed_batch(self):
        self._check(n_real=self.B)

    def test_short_chunk_weights_exclude_padding_repeats(self):
        """2 real pairs + 1 weight-0 repeat: joint statistics equal the
        dense packed batch of the 2 REAL pairs only."""
        self._check(n_real=2)


def test_overlap_reorder_value_identical(monkeypatch):
    """GLAM_SHARDED_OVERLAP=0 (eager fusion emission) and the default
    deferred schedule compute the SAME function: outputs bit-equal,
    gradients equal to float-fusion tolerance (the emission order
    changes which ops XLA fuses, so last-ulp rounding differs in a few
    gradient leaves; docs/overlap_validation.md)."""
    from glam_tpu.parallel.sharded_model import (
        extract_pair_params, make_sharded_pair_forward)
    mol, pro = _pair_setup(seed=4)
    cfg = _pair_cfg(240)
    model, g1, g2, variables = _pair_batches_and_model(mol, pro, cfg)
    params = extract_pair_params(variables["params"], "_GCNConv",
                                 "GlobalLAPool")
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    inputs = tuple(jnp.asarray(a) for a in shard_inputs(*pro, D))

    def run():
        fwd = make_sharded_pair_forward(mesh, cfg)

        def loss(p):
            return fwd(p, g1, *inputs)[0] ** 2

        val, grads = jax.value_and_grad(loss)(params)
        return np.asarray(val), [np.asarray(x) for x in
                                 jax.tree_util.tree_leaves(grads)]

    monkeypatch.setenv("GLAM_SHARDED_OVERLAP", "1")
    v1, g1s = run()
    monkeypatch.setenv("GLAM_SHARDED_OVERLAP", "0")
    v0, g0s = run()
    assert np.array_equal(v1, v0)
    for a, b in zip(g1s, g0s):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
