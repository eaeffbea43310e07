"""Multi-host smoke: 2-process CPU jax.distributed over localhost.

Turns "multi-host ready" from a claim into a fact (SURVEY §2.4 comm
backend): two OS processes rendezvous through jax.distributed's
coordination service (the TPU-pod mechanism, CPU backend), build one
global mesh spanning both processes' virtual devices, and run a sharded
train step whose gradient reduction crosses the process boundary.  Each
process sees only its local shard of the batch; the loss must come back
finite and IDENTICAL on both ranks (GSPMD all-reduce).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent("""
    import jax
    jax.config.update("jax_platforms", "cpu")   # before backend init
    jax.config.update("jax_num_cpu_devices", 2)

    import json
    import numpy as np
    from gdkvm_tpu.parallel.distributed import barrier, \\
        maybe_initialize_distributed, process_info
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.data.pipeline import Batch
    from gdkvm_tpu.models.gdkvm import GDKVM
    from gdkvm_tpu.parallel import batch_sharding, make_mesh, \\
        param_shardings, replicated
    from gdkvm_tpu.train.loop import TrainState, create_train_state, \\
        make_optimizer, make_train_step

    assert maybe_initialize_distributed(), "env vars set; must initialize"
    info = process_info()
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info

    cfg = load_config(None, overrides=[
        "data.image_size=16", "data.clip_len=2", "train.batch_size=4",
        "model.enc_channels=[4,8,12,16]", "model.enc_blocks=[1,1,1,1]",
        "model.num_heads=2", "model.head_dim_k=8", "model.head_dim_v=8",
        "model.kpff_channels=[12,8,4]", "model.compute_dtype=float32",
    ])
    mesh = make_mesh(data=4, model=1)           # spans both processes
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    # Loaded-host hardening: the Gloo context init at the FIRST cross-
    # process op has a fixed ~30 s timeout; align ranks here so per-rank
    # init/compile skew (which can exceed 30 s under CPU contention)
    # never lands inside that window.
    barrier("pre-first-collective")
    state = TrainState(
        step=jax.device_put(state.step, replicated(mesh)),
        params=jax.device_put(state.params, param_shardings(mesh,
                                                            state.params)),
        opt_state=jax.device_put(state.opt_state, jax.tree.map(
            lambda _: replicated(mesh), state.opt_state)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )
    # Every process materializes the same global batch; device_put with the
    # mesh sharding keeps only the local shard per process (SPMD input).
    rng = np.random.default_rng(0)
    batch = Batch(
        frames=rng.integers(0, 255, (4, 2, 16, 16, 1), np.uint8),
        masks=rng.integers(0, 2, (4, 2, 16, 16)).astype(np.uint8),
        valid=np.ones((4, 2), np.float32),
    )
    batch = jax.device_put(batch, batch_sharding(mesh))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    # AOT-compile BEFORE the barrier: compilation is rank-local (any skew
    # is harmless), then the barrier aligns ranks so the EXECUTION's Gloo
    # collectives start within milliseconds of each other — under CPU
    # contention, per-rank compile skew alone can exceed Gloo's fixed
    # ~30 s context-init window.
    with mesh:
        step_exe = step.lower(state, batch).compile()
    barrier("step-compiled")
    with mesh:
        state, metrics = step_exe(state, batch)
    loss = float(jax.device_get(metrics["loss"]))

    # --- Sharded eval shard ACROSS processes (SURVEY §2.4 distributed
    # eval): each process holds only its local half of the val batch; the
    # Dice partial sums reduce exactly over the global mesh, so the final
    # number must be identical on both ranks.
    import jax.numpy as jnp
    from gdkvm_tpu.eval import metrics as M

    @jax.jit
    def eval_part(params, frames_u8, masks, valid):
        x = frames_u8.astype(jnp.float32) / 255.0
        logits, _ = model.apply(params, x)
        return M.dice_accumulate(logits, masks.astype(jnp.int32), valid,
                                 cfg.model.num_classes)

    val = Batch(
        frames=rng.integers(0, 255, (4, 2, 16, 16, 1), np.uint8),
        masks=rng.integers(0, 2, (4, 2, 16, 16)).astype(np.uint8),
        valid=np.ones((4, 2), np.float32),
    )
    val = jax.device_put(val, batch_sharding(mesh))
    with mesh:
        eval_exe = eval_part.lower(state.params, val.frames, val.masks,
                                   val.valid).compile()
    barrier("eval-compiled")
    with mesh:
        part = eval_exe(state.params, val.frames, val.masks, val.valid)
    dice = float(M.dice_finalize(jax.device_get(part))["dice_fg_mean"])
    barrier("post-eval")

    # --- Checkpoint save + abstract restore ACROSS processes: orbax saves
    # are collective (every process writes its addressable shards; the
    # primary commits), and the restore template carries the global-mesh
    # shardings so arrays come back as multi-process jax.Arrays.
    import os as _os
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.train.loop import abstract_train_state
    mgr = CheckpointManager(_os.environ["GDKVM_TEST_CKPT"])
    mgr.save(int(jax.device_get(state.step)), state, force=True)
    mgr.wait()
    tpl = abstract_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    p_shard = param_shardings(mesh, tpl.params)
    tpl = TrainState(
        step=jax.ShapeDtypeStruct(tpl.step.shape, tpl.step.dtype,
                                  sharding=replicated(mesh)),
        params=jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            tpl.params, p_shard),
        opt_state=jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=replicated(mesh)),
            tpl.opt_state),
        rng=jax.ShapeDtypeStruct(tpl.rng.shape, tpl.rng.dtype,
                                 sharding=replicated(mesh)),
    )
    restored = mgr.restore(tpl)
    batch2 = Batch(
        frames=rng.integers(0, 255, (4, 2, 16, 16, 1), np.uint8),
        masks=rng.integers(0, 2, (4, 2, 16, 16)).astype(np.uint8),
        valid=np.ones((4, 2), np.float32),
    )
    batch2 = jax.device_put(batch2, batch_sharding(mesh))
    barrier("post-restore")
    with mesh:
        restored, metrics_r = step_exe(restored, batch2)
    loss_r = float(jax.device_get(metrics_r["loss"]))
    mgr.close()

    print(json.dumps({"process": info["process_index"], "loss": loss,
                      "dice": dice, "restored_loss": loss_r,
                      **info}), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_workers(ckpt_dir: str):
    """Spawn the 2-process rendezvous once; return parsed worker outputs
    or raise RuntimeError with both workers' stderr."""
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)             # workers pick their own
    env_base["GDKVM_PLATFORM"] = "cpu"
    env_base["GDKVM_TEST_CKPT"] = ckpt_dir
    env_base["GDKVM_DIST_TIMEOUT"] = "600"      # loaded-host margin
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env.update(GDKVM_COORDINATOR=f"127.0.0.1:{port}",
                   GDKVM_NUM_PROCESSES="2", GDKVM_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs, errs = [], []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            errs.append(err)
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker failed:\n{err[-3000:]}")
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return outs


def test_two_process_distributed_train_step(tmp_path):
    # One retry: on a loaded 1-CPU host the rendezvous/collectives can
    # time out through no fault of the code (measured in the r3 review:
    # failed under a concurrent suite, passed isolated).  A fresh attempt
    # on a fresh port distinguishes "code broken" (fails twice) from
    # "host busy" (second attempt succeeds).
    try:
        outs = _launch_workers(str(tmp_path / "ckpt"))
    except (RuntimeError, subprocess.TimeoutExpired) as first:
        import shutil
        shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
        print(f"first attempt failed ({first}); retrying once", flush=True)
        outs = _launch_workers(str(tmp_path / "ckpt"))
    assert {o["process"] for o in outs} == {0, 1}
    # Train-step loss, sharded-eval Dice, and the post-restore step's loss
    # must each be IDENTICAL across ranks: every one is the result of a
    # cross-process collective (grad all-reduce / Dice partial-sum reduce /
    # restore-then-step), so any divergence means the processes are not
    # actually computing on one global mesh.
    for key in ("loss", "dice", "restored_loss"):
        vals = [o[key] for o in outs]
        assert all(v == vals[0] for v in vals), (key, vals)
    assert all(o["global_devices"] == 4 and o["local_devices"] == 2
               for o in outs)
