"""Command-line entry point.

Usage mirrors the reference (src/main.cpp:15-49):

    tpu-gcn <graph_name> [num_nodes input_dim hidden_dim output_dim dropout
                          learning_rate weight_decay epochs early_stopping]

The reference's usage string advertises those nine positional overrides but never
parses them (main.cpp:24-25 vs :29-36); here they work. ``num_nodes``,
``input_dim`` and ``output_dim`` remain parser-inferred regardless, exactly like
the reference (parser.cpp:45,90-91) — passing them is accepted but ignored, with
a warning. Dataset names starting with ``synth-`` generate the synthetic stand-in
instead of reading files (the reference ships no data).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from cuda_gcn_tpu.config import GCNConfig

_POSITIONAL = ["num_nodes", "input_dim", "hidden_dim", "output_dim", "dropout",
               "learning_rate", "weight_decay", "epochs", "early_stopping"]
_PARSER_INFERRED = {"num_nodes", "input_dim", "output_dim"}
_FLOAT_FIELDS = {"dropout", "learning_rate", "weight_decay"}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu-gcn",
        description="TPU-native full-batch GCN training (capabilities of hengdashi/cuda_gcn).",
    )
    p.add_argument("graph_name", help="dataset name under --data-dir, or synth-{cora,citeseer,pubmed,reddit}")
    p.add_argument("overrides", nargs="*", metavar="HP",
                   help=f"positional hyperparameter overrides, in order: {' '.join(_POSITIONAL)}")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "segment", "ell", "pallas", "dense", "bsr"],
                   help="graphsum backend")
    p.add_argument("--compute-dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--halo-dtype", default="bfloat16", choices=["float32", "bfloat16"],
                   help="wire format of --mesh halo payloads (bf16 halves the "
                        "per-layer ppermute bytes; float32 for bit-exact "
                        "single-chip parity)")
    p.add_argument("--feature-matmul", default="dense", choices=["dense", "sparse"],
                   help="layer-0 feature transform: densified X on the MXU, or "
                        "CSR-values SpMM (reference SparseMatmul parity)")
    p.add_argument("--platform", default=None, choices=["tpu", "cpu"],
                   help="force a JAX platform (default: environment's)")
    p.add_argument("--compilation-cache", default=".cache/xla", metavar="DIR",
                   help="persistent XLA compile-cache dir ('' disables); a "
                        "warm restart then pays seconds of compile, not "
                        "minutes (the reference pays zero — AOT C++)")
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="train sharded over an N-device mesh (graph partition "
                        "+ halo exchange; the reference is single-device only)")
    p.add_argument("--save-checkpoint", default=None, metavar="PATH",
                   help="save the final train state to PATH (npz)")
    p.add_argument("--load-checkpoint", default=None, metavar="PATH",
                   help="initialize the train state from PATH before training")
    p.add_argument("--metrics-csv", default=None, metavar="PATH",
                   help="write the per-epoch history as CSV")
    p.add_argument("--metrics-jsonl", default=None, metavar="PATH",
                   help="write the per-epoch history as JSONL (with run metadata)")
    p.add_argument("--timing", action="store_true",
                   help="print the phase-timer averages after the run "
                        "(the reference's PRINT_TIMER_AVERAGE, src/common/timer.h:26)")
    p.add_argument("--prime-cache", action="store_true",
                   help="AOT-compile this run's device programs into the "
                        "persistent compile cache and exit without training "
                        "(train.prime_cache; pays the cold-compile cost "
                        "explicitly so the next run starts warm)")
    for name in _POSITIONAL:
        typ = float if name in _FLOAT_FIELDS else int
        p.add_argument(f"--{name.replace('_', '-')}", type=typ, default=None)
    return p


def config_from_args(args: argparse.Namespace) -> GCNConfig:
    cfg = GCNConfig(seed=args.seed, graphsum_backend=args.backend,
                    compute_dtype=args.compute_dtype, halo_dtype=args.halo_dtype,
                    feature_matmul=args.feature_matmul)
    updates: dict = {}
    for name, value in zip(_POSITIONAL, args.overrides):
        typ = float if name in _FLOAT_FIELDS else int
        try:
            updates[name] = typ(value)
        except ValueError:
            raise SystemExit(f"invalid value for {name}: {value!r} (expected {typ.__name__})")
    for name in _POSITIONAL:  # --flag form wins over positional
        flag_val = getattr(args, name)
        if flag_val is not None:
            updates[name] = flag_val
    ignored = sorted(_PARSER_INFERRED & updates.keys())
    if ignored:
        print(f"note: {', '.join(ignored)} are inferred from the dataset; override ignored",
              file=sys.stderr)
        for name in ignored:
            updates.pop(name)
    return dataclasses.replace(cfg, **updates)


def main(argv: list[str] | None = None) -> int:
    args = build_argparser().parse_args(argv)
    if len(args.overrides) > len(_POSITIONAL):
        print(f"too many positional overrides (max {len(_POSITIONAL)})", file=sys.stderr)
        return 1

    cfg = config_from_args(args)

    from cuda_gcn_tpu.data.synthetic import PROFILES, VARIANTS, make_synthetic

    if args.graph_name in PROFILES or args.graph_name in VARIANTS:
        dataset = make_synthetic(args.graph_name, seed=cfg.seed)
        print(f"Generated synthetic dataset {args.graph_name}.")
    else:
        from cuda_gcn_tpu.data.parser import load_dataset

        try:
            dataset = load_dataset(args.graph_name, data_dir=args.data_dir)
        except FileNotFoundError as e:
            print(f"Cannot read input: {args.graph_name} ({e})", file=sys.stderr)
            return 1
        print("Parse Graph Succeeded.")
        print("Parse Node Succeeded.")
        print("Parse Split Succeeded.")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compilation_cache:
        from cuda_gcn_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)
    # multi-process init must precede ANY backend use (jax.devices below
    # initializes the backend); no-op without coordinator env/args
    from cuda_gcn_tpu.parallel import multihost

    multihost.initialize()
    platform = jax.devices()[0].platform.upper()
    print(f"RUNNING ON {platform}")

    from cuda_gcn_tpu import train as train_mod

    if args.prime_cache:
        if args.mesh:
            print("--prime-cache is single-chip (the sharded path compiles "
                  "per-mesh programs)", file=sys.stderr)
            return 1
        programs = train_mod.prime_cache(cfg, dataset)
        total = sum(s for _, _, s in programs)
        print(f"primed {len(programs)} programs in {total:.1f}s")
        return 0

    initial_state = None
    if args.load_checkpoint:
        from cuda_gcn_tpu.utils.checkpoint import restore_state

        template = train_mod.create_state(dataset.apply_config(cfg))
        initial_state = restore_state(args.load_checkpoint, like=template)
        print(f"restored checkpoint from {args.load_checkpoint}")
    if args.mesh:
        if args.mesh > jax.device_count():
            print(f"--mesh {args.mesh} needs {args.mesh} devices, have "
                  f"{jax.device_count()}", file=sys.stderr)
            return 1
        if args.timing:
            print("note: --timing reports only train/test phases with --mesh "
                  "(per-op timers are single-chip)", file=sys.stderr)
        from cuda_gcn_tpu.parallel import sharded

        mesh = sharded.make_mesh(args.mesh)
        print(f"SHARDED over {args.mesh} devices (graph partition + halo exchange)")
        result = sharded.run_sharded(cfg, dataset, mesh, verbose=True,
                                     initial_state=initial_state)
    else:
        result = train_mod.run(cfg, dataset, verbose=True, initial_state=initial_state,
                               time_ops=args.timing)

    if args.save_checkpoint:
        from cuda_gcn_tpu.utils.checkpoint import save_state

        save_state(args.save_checkpoint, result.state)
        print(f"checkpoint saved to {args.save_checkpoint}")
    if args.metrics_csv or args.metrics_jsonl:
        from cuda_gcn_tpu.utils.logging import write_history_csv, write_history_jsonl

        if args.metrics_csv:
            write_history_csv(args.metrics_csv, result.history)
        if args.metrics_jsonl:
            meta = dict(dataset=args.graph_name, seed=cfg.seed,
                        backend=cfg.graphsum_backend, platform=platform,
                        test_loss=result.test_loss, test_acc=result.test_acc,
                        total_train_time=result.total_train_time)
            write_history_jsonl(args.metrics_jsonl, result.history, run_meta=meta)
    if args.timing:
        from cuda_gcn_tpu.utils.timer import timers

        print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
