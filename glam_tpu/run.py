"""Single-trial CLI entry point — parity with reference run.py:10-62.

Usage: python -m glam_tpu.run --dataset demo --dataset_root ./demo ...
All ~25 reference flags are supported with the same names/defaults so
AutoML-generated commands carry over verbatim.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", default="./dataset", type=str)
    p.add_argument("--dataset", type=str, default="esol")
    p.add_argument("--split", type=str, default="random",
                   help="random, scaffold")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--split_seed", type=int, default=1234)
    p.add_argument("--gpu", default=0, type=int,
                   help="device index (TPU chip id)")
    p.add_argument("--note", default="None2", type=str)

    p.add_argument("--hid_dim_alpha", default=4, type=int)
    p.add_argument("--mol_block", type=str, default="_NNConv")
    p.add_argument("--pro_block", type=str, default="_GCNConv",
                   help="protein-tower conv for DTI datasets "
                        "(reference src_2gi_dti_scr/run.py:19)")
    p.add_argument("--e_dim", default=1024, type=int)
    p.add_argument("--out_dim", default=1, type=int)
    p.add_argument("--message_steps", default=3, type=int)
    p.add_argument("--mol_readout", default="GlobalPool5", type=str)
    p.add_argument("--pro_readout", default="GlobalPool5", type=str,
                   help="protein-tower readout for DTI datasets")

    p.add_argument("--pre_norm", default="_None", type=str)
    p.add_argument("--graph_norm", default="_PairNorm", type=str)
    p.add_argument("--flat_norm", default="_None", type=str)
    p.add_argument("--end_norm", default="_None", type=str)
    p.add_argument("--pre_do", default="_None()", type=str)
    p.add_argument("--graph_do", default="_None()", type=str)
    p.add_argument("--flat_do", default="Dropout(0.2)", type=str)
    p.add_argument("--end_do", default="Dropout(0.2)", type=str)
    p.add_argument("--pre_act", default="RReLU", type=str)
    p.add_argument("--graph_act", default="RReLU", type=str)
    p.add_argument("--flat_act", default="RReLU", type=str)
    p.add_argument("--end_act", default="RReLU", type=str,
                   help="pair-head activation (src_2gi_*/run.py:38)")
    p.add_argument("--graph_res", default=1, type=int)

    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--epochs", default=800, type=int)
    p.add_argument("--loss", default="mse", type=str)
    p.add_argument("--optim", default="Adam", type=str)
    p.add_argument("--k", default=6, type=int, help="lookahead steps")
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--lr_reduce_rate", default=0.7, type=float)
    p.add_argument("--lr_reduce_patience", default=20, type=int)
    p.add_argument("--early_stop_patience", default=50, type=int)
    p.add_argument("--verbose_patience", default=500, type=int)
    p.add_argument("--scan_steps", default=8, type=int,
                   help="optimizer steps fused per device dispatch")
    p.add_argument("--work_dir", default=None, type=str,
                   help="where log_{dataset}/ run dirs are created")
    p.add_argument("--platform", default=None, type=str,
                   help="force a JAX platform (e.g. cpu, tpu)")
    p.add_argument("--resume", default=None, type=str,
                   help="run dir (or last_save.ckpt) to resume "
                        "mid-training from")
    p.add_argument("--dtype", default="float32", type=str,
                   help="compute dtype for the fwd/bwd pass (float32 or "
                        "bfloat16; master params stay float32)")
    p.add_argument("--compile_cache", default=None, type=str,
                   help="persistent XLA compile-cache dir ('off' to "
                        "disable; default ~/.cache/glam_tpu/xla)")
    p.add_argument("--pallas", default="auto", type=str,
                   help="fused Pallas attention kernel for "
                        "_TripletMessage (ops/pallas/triplet_fused): "
                        "'auto' (default) picks the measured-fastest "
                        "path — currently the XLA segment pipeline "
                        "(325M vs 2.2M edges/s on v5e, see bench.py); "
                        "1 = force the fused kernel, 0 = force XLA")
    p.add_argument("--probe_compile", default=0.0, type=float,
                   help="validated compile: minimum train-dispatch "
                        "edges/s; below it the persistent-cache entry "
                        "is evicted and the step recompiled (up to 3 "
                        "attempts) before training. 0 = off. Guards "
                        "against the remote-compile service's ~30x "
                        "executable-quality lottery")
    p.add_argument("--n_devices", default=1, type=int,
                   help="data-parallel training over the first N chips "
                        "(batch_size must be divisible by N)")
    p.add_argument("--halo", default="a2a", type=str,
                   help="halo plan for --pro_shards: 'a2a' (one "
                        "all_to_all), 'ring' (per-distance ppermutes "
                        "— fewer ICI bytes on banded contact maps), or "
                        "'auto' (plan both over the corpus; ring only "
                        "when it halves the shipped rows)")
    p.add_argument("--pro_shards", default=1, type=int,
                   help="DTI datasets: shard the protein tower over the "
                        "first N devices (node-partitioned giant-graph "
                        "model parallelism with halo exchange; one pair "
                        "per step — for proteins too large for one "
                        "chip). Mutually exclusive with --n_devices > 1")
    p.add_argument("--pair_batch", default=1, type=int,
                   help="with --pro_shards: pairs per optimizer step — "
                        "the replicated molecule tower is vmapped over "
                        "B pairs and every pair's protein stays "
                        "node-sharded over the full mesh (one "
                        "executable; loss = masked mean over the "
                        "batch). 1 = the giant-protein one-pair regime")
    return p


def main(argv=None):
    args = vars(build_parser().parse_args(argv))
    if args.get("platform"):
        import jax
        jax.config.update("jax_platforms", args["platform"])
    # multi-chip hosts: pin this trial to the chip the scheduler assigned
    # (--gpu, reference utils.py:219-225 per-GPU pinning); single-trial
    # DP (--n_devices > 1) manages its own mesh instead
    gpu = int(args.get("gpu") or 0)
    if gpu > 0 and int(args.get("n_devices", 1)) <= 1:
        import jax
        devs = jax.devices()
        if gpu < len(devs):
            jax.config.update("jax_default_device", devs[gpu])
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache(args.pop("compile_cache", None))
    from .data.datasets import auto_dataset
    from .train.pair_trainer import make_auto_trainer
    from .utils.seed import seed_everything

    seed_everything(args["seed"])
    print("Loading dataset...")
    args, dataset, trainer_kind = auto_dataset(args)
    print("Training init...")
    resume = args.pop("resume", None)
    pro_shards = int(args.get("pro_shards", 1))
    if pro_shards > 1:
        if trainer_kind not in ("pair_binary", "pair_screening",
                                "pair_regression"):
            raise ValueError("--pro_shards applies to DTI datasets "
                             f"only (got trainer kind {trainer_kind})")
        if int(args.get("n_devices", 1)) > 1:
            raise ValueError("--pro_shards and --n_devices are "
                             "mutually exclusive")
        from .train.sharded_pair_trainer import ShardedPairTrainer
        trainer = ShardedPairTrainer(args, dataset, task=trainer_kind,
                                     work_dir=args.get("work_dir"))
        if resume:
            trainer.resume(resume)
        trainer.train_and_test()
        return trainer
    if int(args.get("pair_batch", 1)) > 1:
        raise ValueError("--pair_batch applies to --pro_shards runs "
                         "only (dense trainers batch via --batch_size)")
    trainer = make_auto_trainer(args, dataset, trainer_kind,
                                work_dir=args.get("work_dir"))
    if resume:
        trainer.resume(resume)
    trainer.train_and_test()
    return trainer


if __name__ == "__main__":
    main()
