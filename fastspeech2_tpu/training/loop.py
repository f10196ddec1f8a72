"""Full training orchestration (reference train.py:21-169 equivalent).

Builds the model/optimizer/mesh, shards params and batches, runs the jitted
train step over bucketed batches, and performs the periodic duties: scalar
logging every log_step, one synthesized sample every synth_step, a val-set
pass every val_step, an orbax checkpoint every save_step.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fastspeech2_tpu.configs.config import (
    FastSpeech2Config,
    OptimConfig,
    StepConfig,
)
from fastspeech2_tpu.data import BucketedLoader, FeatureDataset
from fastspeech2_tpu.models import FastSpeech2
from fastspeech2_tpu.parallel import make_mesh, shard_variables
from fastspeech2_tpu.training.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from fastspeech2_tpu.training.optim import make_optimizer
from fastspeech2_tpu.training.step import make_eval_step, make_train_step
from fastspeech2_tpu.training.train_state import TrainState
from fastspeech2_tpu.utils.jit_cache import cached_jit
from fastspeech2_tpu.utils.logging import TrainLogger


def _model_batch(batch):
    """Strip host-only fields from a loader batch."""
    return {k: v for k, v in batch.items()
            if k not in ("ids", "raw_texts", "valid_count")}


def init_training(preprocess_config, model_config, train_config,
                  restore_step=0, mesh=None, dtype=jnp.float32, seed=1234):
    """Build (model, cfg, state, optimizer, mesh, shardings)."""
    cfg = FastSpeech2Config.build(preprocess_config, model_config)
    optim_cfg = OptimConfig.build(train_config)
    model = FastSpeech2(cfg, dtype=dtype)
    optimizer, schedule = make_optimizer(optim_cfg, cfg.encoder_hidden)

    rng = jax.random.PRNGKey(seed)
    B, Pn, T = 2, 16, 64
    init_fn = cached_jit(
        ("model_init", model),
        lambda: jax.jit(model.init, static_argnames=("max_mel_len", "train")))
    variables = init_fn(
        {"params": rng, "dropout": rng},
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B, Pn), jnp.int32),
        jnp.full((B,), Pn, jnp.int32),
        mels=jnp.zeros((B, T, cfg.n_mel_channels)),
        mel_lens=jnp.full((B,), T, jnp.int32),
        max_mel_len=T,
        p_targets=jnp.zeros((B, Pn)),
        e_targets=jnp.zeros((B, Pn)),
        d_targets=jnp.full((B, Pn), 4, jnp.int32),
        train=True,
    )

    if mesh is None:
        # the data axis must divide the per-micro-step batch; idle any
        # remainder devices
        import math

        acc = int(train_config["optimizer"].get("grad_acc_step", 1))
        micro = max(OptimConfig.build_batch_size(train_config)
                    // max(acc, 1), 1)
        data = math.gcd(micro, len(jax.devices()))
        mesh = make_mesh(data=max(data, 1), model=1)
    variables, shardings = shard_variables(variables, mesh)
    state = TrainState.create(variables, optimizer, step=restore_step)

    if restore_step:
        ckpt_dir = os.path.join(train_config["path"]["ckpt_path"])
        # restore INTO the sharded layout: an abstract target carrying each
        # leaf's sharding, else orbax materializes everything committed to
        # device 0 and the jitted step rejects the mixed placement.
        # Non-mesh leaves (optimizer counts, step) restore replicated.
        replicated = NamedSharding(mesh, P())

        def _abstract(x):
            sh = x.sharding if isinstance(x.sharding, NamedSharding) \
                else replicated
            return jax.ShapeDtypeStruct(jnp.shape(x), x.dtype, sharding=sh)

        abstract = jax.tree_util.tree_map(_abstract, state)
        state = restore_checkpoint(ckpt_dir, abstract, restore_step)

    return model, cfg, optim_cfg, state, optimizer, mesh


def synth_one_sample(model, cfg, state, batch, preprocess_config,
                     vocoder=None, infer_fn=None):
    """First-sample synthesis artifacts for TensorBoard
    (reference utils/tools.py:109-161): a (predicted, ground-truth) mel
    figure and, when a vocoder is available, reconstructed + predicted
    wavs."""
    import json

    from fastspeech2_tpu.synthesis.plotting import (
        expand_by_duration,
        plot_mel,
    )

    if infer_fn is None:
        # one-off use; callers in the hot loop pass a cached jit so each
        # synth_step reuses the compiled executable
        infer_fn = jax.jit(model.apply,
                           static_argnames=("max_mel_len", "train"))
    out = infer_fn(
        state.variables(),
        jnp.asarray(batch["speakers"][:1]), jnp.asarray(batch["texts"][:1]),
        jnp.asarray(batch["src_lens"][:1]),
        mel_lens=jnp.asarray(batch["mel_lens"][:1]),
        max_mel_len=batch["mels"].shape[1],
        p_targets=jnp.asarray(batch["pitches"][:1]),
        e_targets=jnp.asarray(batch["energies"][:1]),
        d_targets=jnp.asarray(batch["durations"][:1]),
        train=False)
    mel_len = int(np.asarray(out.mel_len)[0])
    src_len = int(batch["src_lens"][0])
    mel_pred = np.asarray(out.postnet_mel)[0, :mel_len].T
    mel_target = batch["mels"][0, :mel_len].T
    duration = batch["durations"][0, :src_len]
    pp = preprocess_config["preprocessing"]
    pitch = batch["pitches"][0]
    energy = batch["energies"][0]
    if pp["pitch"]["feature"] == "phoneme_level":
        pitch = expand_by_duration(pitch[:src_len], duration)
    else:
        pitch = pitch[:mel_len]
    if pp["energy"]["feature"] == "phoneme_level":
        energy = expand_by_duration(energy[:src_len], duration)
    else:
        energy = energy[:mel_len]
    stats_path = os.path.join(
        preprocess_config["path"]["preprocessed_path"], "stats.json")
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f)
        stats = stats["pitch"] + stats["energy"][:2]
    else:
        stats = [0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    fig = plot_mel(
        [(mel_pred, pitch, energy), (mel_target, pitch, energy)],
        stats, ["Synthesized Spectrogram", "Ground-Truth Spectrogram"])

    wav_reconstruction = wav_prediction = None
    if vocoder is not None:
        from fastspeech2_tpu.synthesis.vocoder import vocoder_infer

        wav_reconstruction = vocoder_infer(
            batch["mels"][:1], vocoder, preprocess_config,
            lengths=[mel_len])[0]
        wav_prediction = vocoder_infer(
            np.asarray(out.postnet_mel[:1], np.float32), vocoder,
            preprocess_config, lengths=[mel_len])[0]
    return fig, wav_reconstruction, wav_prediction


def train(preprocess_config, model_config, train_config, restore_step=0,
          dtype=jnp.float32, max_steps=None, log=print, vocoder=None,
          profile_dir=None):
    """The reference main() loop (train.py:21-169).

    profile_dir: when set, captures a jax.profiler device trace of steps
    11-20 into that directory (view with TensorBoard) — the observability
    superset of the reference's tqdm-only progress (SURVEY.md section 5).
    """
    steps = StepConfig.build(train_config)
    optim_cfg = OptimConfig.build(train_config)
    total_step = min(steps.total_step, max_steps or steps.total_step)

    model, cfg, optim_cfg, state, optimizer, mesh = init_training(
        preprocess_config, model_config, train_config, restore_step,
        dtype=dtype)
    n_params = state.num_params()
    log(f"Number of FastSpeech2 Parameters: {n_params}")

    dataset = FeatureDataset("train.txt", preprocess_config)
    # coarse buckets by default: remote compiles are minutes each, so ~7%
    # padding waste for a handful of distinct (P, T) shapes is the right
    # trade; override via train.yaml `bucket: {text: .., mel: ..}`
    bucket_cfg = train_config.get("bucket", {})
    loader = BucketedLoader(
        dataset, batch_size=optim_cfg.batch_size, group_size=4,
        shuffle=True, drop_last=True, max_mel_len=cfg.max_seq_len,
        text_bucket=bucket_cfg.get("text", 32),
        mel_bucket=bucket_cfg.get("mel", 160))
    val_dataset = FeatureDataset("val.txt", preprocess_config)

    # canonical state placement: params/batch_stats keep their mesh
    # shardings, everything created off-mesh (optimizer counts, step)
    # goes replicated.  Pinning the step's out_shardings to exactly these
    # keeps input and output shardings identical, so ONE executable
    # serves every step — without it GSPMD's canonicalized output
    # shardings feed back in and force a second full compile.
    replicated = NamedSharding(mesh, P())

    def _canon(x):
        sh = getattr(x, "sharding", None)
        return sh if (isinstance(sh, NamedSharding) and sh.mesh == mesh) \
            else replicated

    state_shardings = jax.tree_util.tree_map(_canon, state)
    state = jax.device_put(state, state_shardings)

    # the optimizer is a pure function of (optim_cfg, encoder_hidden) and
    # cfg lives inside the model, so with the mesh these keys fully
    # identify each trace
    train_step = cached_jit(
        ("train_step", model, optim_cfg, mesh),
        lambda: jax.jit(
            make_train_step(model, cfg, optimizer,
                            grad_acc_step=optim_cfg.grad_acc_step),
            donate_argnums=0,
            out_shardings=(state_shardings, replicated)))
    eval_step = cached_jit(
        ("eval_step", model),
        lambda: jax.jit(make_eval_step(model, cfg)))
    infer_fn = cached_jit(
        ("model_infer", model),
        lambda: jax.jit(model.apply,
                        static_argnames=("max_mel_len", "train")))

    logger = TrainLogger(os.path.join(
        train_config["path"]["log_path"], "train"))
    val_logger = TrainLogger(os.path.join(
        train_config["path"]["log_path"], "val"))
    ckpt_dir = train_config["path"]["ckpt_path"]

    from fastspeech2_tpu.training.step import dropout_key

    batch_sharding = NamedSharding(mesh, P("data"))
    rng = dropout_key(restore_step + 1)
    step = restore_step
    epoch = 0
    t0 = time.time()
    t_rate = t0
    frames_done = 0
    from fastspeech2_tpu.data.prefetch import PrefetchIterator

    acc = optim_cfg.grad_acc_step
    if acc > 1 and optim_cfg.batch_size % acc:
        raise ValueError(
            f"batch_size {optim_cfg.batch_size} must be divisible by "
            f"grad_acc_step {acc}")

    # with accumulation the batch axis moves to position 1; the data-mesh
    # axis must follow it
    micro_sharding = (NamedSharding(mesh, P(None, "data")) if acc > 1
                      else batch_sharding)

    # optional bf16 mel transfer: the ~5 MB host->device batch is the
    # wall-clock bottleneck through a relay link; mels are the bulk of it
    # and the step upcasts them to fp32 on device (train.yaml
    # `transfer: {mel_bf16: true}`)
    mel_bf16 = bool(train_config.get("transfer", {}).get("mel_bf16", False))
    if mel_bf16:
        import ml_dtypes
        _mel_wire_dtype = ml_dtypes.bfloat16

    def host_model_batch(batch):
        model_batch = _model_batch(batch)
        if mel_bf16:
            model_batch = dict(model_batch)
            model_batch["mels"] = model_batch["mels"].astype(_mel_wire_dtype)
        if acc > 1:
            # leading micro-batch axis for the lax.scan accumulation
            model_batch = {
                k: v.reshape((acc, v.shape[0] // acc) + v.shape[1:])
                for k, v in model_batch.items()
            }
        return model_batch

    def to_device(batch):
        device = {
            k: jax.device_put(v, micro_sharding)
            for k, v in host_model_batch(batch).items()
        }
        return batch, device

    # preemption handling (absent upstream, SURVEY.md section 5): on
    # SIGTERM/SIGUSR1 (what TPU preemption notices deliver) finish the
    # in-flight step, checkpoint, and exit cleanly so --restore_step -1
    # resumes exactly where training stopped
    import signal
    import threading

    preempted = threading.Event()

    def _on_preempt(signum, frame):
        log(f"Received signal {signum}: checkpointing at the next step "
            "boundary")
        preempted.set()

    installed = []
    if threading.current_thread() is threading.main_thread():
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            installed.append((sig, signal.signal(sig, _on_preempt)))

    def run_duties(step, losses, batch, state, frames):
        """Per-boundary duties (log/synth/val/save), shared by the
        per-step and the scanned paths."""
        nonlocal frames_done, t_rate
        frames_done += frames
        if step % steps.log_step == 0:
            vals = [float(v) for v in losses]
            now = time.time()
            rate = frames_done / max(now - t_rate, 1e-6)
            frames_done, t_rate = 0, now
            msg1 = f"Step {step}/{total_step}"
            msg2 = ("Total Loss: {:.4f}, Mel Loss: {:.4f}, Mel PostNet "
                    "Loss: {:.4f}, Pitch Loss: {:.4f}, Energy Loss: "
                    "{:.4f}, Duration Loss: {:.4f}").format(*vals)
            log(msg1 + ", " + msg2
                + f" ({now - t0:.1f}s, {rate:.0f} mel frames/s)")
            logger.message(msg1 + ", " + msg2)
            logger.scalars(step, vals)

        if step % steps.synth_step == 0:
            try:
                fig, wav_rec, wav_pred = synth_one_sample(
                    model, cfg, state, batch, preprocess_config,
                    vocoder, infer_fn=infer_fn)
                logger.figure(
                    f"Training/step_{step}_{batch['ids'][0]}", fig)
                sr = preprocess_config["preprocessing"]["audio"][
                    "sampling_rate"]
                if wav_rec is not None:
                    logger.audio(
                        f"Training/step_{step}_"
                        f"{batch['ids'][0]}_reconstructed",
                        wav_rec.astype(np.float32), sr)
                    logger.audio(
                        f"Training/step_{step}_"
                        f"{batch['ids'][0]}_synthesized",
                        wav_pred.astype(np.float32), sr)
                import matplotlib.pyplot as plt

                plt.close(fig)
            except Exception as e:  # non-fatal duty
                log(f"synth_step failed: {e}")

        if step % steps.val_step == 0:
            val_losses = evaluate(
                eval_step, state, val_dataset, preprocess_config,
                optim_cfg.batch_size, cfg)
            msg = ("Validation Step {}, Total Loss: {:.4f}, Mel Loss: "
                   "{:.4f}, Mel PostNet Loss: {:.4f}, Pitch Loss: "
                   "{:.4f}, Energy Loss: {:.4f}, Duration Loss: {:.4f}"
                   ).format(step, *val_losses)
            log(msg)
            val_logger.message(msg)
            val_logger.scalars(step, val_losses)
            # one val sample to TB (reference evaluate.py:57-84)
            try:
                val_loader = BucketedLoader(
                    val_dataset, batch_size=1, group_size=1,
                    shuffle=False, drop_last=False,
                    max_mel_len=cfg.max_seq_len)
                val_batch = next(iter(val_loader.epoch(0)))
                fig, wav_rec, wav_pred = synth_one_sample(
                    model, cfg, state, val_batch, preprocess_config,
                    vocoder, infer_fn=infer_fn)
                val_logger.figure(
                    f"Validation/step_{step}_{val_batch['ids'][0]}",
                    fig)
                import matplotlib.pyplot as plt

                plt.close(fig)
            except Exception as e:  # non-fatal duty
                log(f"val synth failed: {e}")

        if step % steps.save_step == 0:
            save_checkpoint(ckpt_dir, state, step)
            log(f"Saved checkpoint at step {step}")

    scan_step = int(train_config["step"].get("scan_step", 1))
    if scan_step > 1:
        # scan mode stacks the whole epoch in HBM; cap its share so the
        # params/opt-state/activations still fit (fallback: per-step path)
        scan_budget_mb = float(
            train_config["step"].get("scan_hbm_budget_mb", 8192))
        state, step = _train_scanned(
            scan_step, state, step, total_step, steps, loader,
            host_model_batch, acc, model, cfg, optimizer, optim_cfg, mesh,
            state_shardings, replicated, rng, run_duties, preempted, log,
            hbm_budget_bytes=int(scan_budget_mb * 1024 * 1024))

    while step < total_step and not preempted.is_set():
        for batch, device_batch in PrefetchIterator(
                loader.epoch(epoch), depth=2, transform=to_device):
            if step >= total_step:
                break
            if preempted.is_set():
                save_checkpoint(ckpt_dir, state, step)
                log(f"Preemption checkpoint saved at step {step}")
                break
            if profile_dir and step - restore_step == 10:
                jax.profiler.start_trace(profile_dir)
            state, losses = train_step(state, device_batch, rng)
            step += 1
            if profile_dir and step - restore_step == 20:
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()

            run_duties(step, losses, batch, state,
                       int(batch["mel_lens"].sum()))
        epoch += 1

    for sig, prev in installed:
        signal.signal(sig, prev)
    save_checkpoint(ckpt_dir, state, step)
    logger.close()
    val_logger.close()
    return state


def _train_scanned(scan_step, state, step, total_step, steps, loader,
                   host_model_batch, acc, model, cfg, optimizer, optim_cfg,
                   mesh, state_shardings, replicated, rng, run_duties,
                   preempted, log, hbm_budget_bytes=8 << 30):
    """Device-resident scanned training (train.yaml `step: scan_step: K`).

    Per-step dispatch through a relay-attached TPU costs far more than the
    step's compute (~0.69 s/step observed vs ~13 ms device time): every
    step re-uploads its batch and pays a host round-trip.  When the
    preprocessed epoch fits in HBM — true for every bundled corpus — we
    stack each bucket-shape group's batches on device ONCE and run K
    optimizer steps per dispatch with lax.scan, indexing the stack by a
    host-chosen [K] schedule (reshuffled every pass).  Numerics per step
    are the per-step path's (same inner train_step, same rng fold).

    Trade-off vs the streaming loader: batch composition is frozen at
    epoch 0 (the reference's sort-by-length group collate barely reshuffles
    composition either, dataset.py group_size=4); order still reshuffles
    every pass through a group.
    """
    import math

    from fastspeech2_tpu.training.step import make_scanned_train_step

    # dispatch boundaries must land exactly on every active duty period
    K = scan_step
    for p in (steps.log_step, steps.synth_step, steps.val_step,
              steps.save_step):
        if p < total_step:
            K = math.gcd(K, p)
    if K <= 1:
        log("scan_step incompatible with duty periods; using per-step path")
        return state, step

    # Fallback policy (docs/tpu_notes.md "scan-mode scale limits"): the
    # stacked epoch must fit the configured HBM share
    # (step.scan_hbm_budget_mb, default 8 GiB of the v5e's 16).  When it
    # would not — real LJSpeech-scale corpora — use the streaming per-step
    # path, which bounds device memory at one batch regardless of corpus
    # size.  The budget check runs while the epoch is being gathered so an
    # over-budget corpus aborts the gather early instead of exhausting
    # host RAM on a doomed stack.
    groups = {}
    stacked_bytes = 0
    for b in loader.epoch(0):
        mb = host_model_batch(b)
        stacked_bytes += sum(np.asarray(v).nbytes for v in mb.values())
        if stacked_bytes > hbm_budget_bytes:
            log(f"scan mode disabled: stacked epoch exceeds the "
                f"{hbm_budget_bytes / 2**20:.0f} MiB HBM budget "
                f"(step.scan_hbm_budget_mb); falling back to the "
                f"streaming per-step path")
            return state, step
        sig = tuple(sorted(
            (k, tuple(v.shape), str(v.dtype)) for k, v in mb.items()))
        groups.setdefault(sig, {"model": [], "raw": []})
        groups[sig]["model"].append(mb)
        groups[sig]["raw"].append(b)

    spec = P(*((None, None, "data") if acc > 1 else (None, "data")))
    sharding = NamedSharding(mesh, spec)
    glist = []
    for g in groups.values():
        stacked = jax.device_put(
            {k: np.stack([mb[k] for mb in g["model"]])
             for k in g["model"][0]}, sharding)
        frames = np.array([int(b["mel_lens"].sum()) for b in g["raw"]])
        glist.append({"stacked": stacked, "n": len(g["model"]),
                      "raw0": g["raw"][0], "frames": frames})
    n_total = sum(g["n"] for g in glist)
    log(f"scan mode: {n_total} batches in {len(glist)} shape group(s) "
        f"device-resident, {K} steps/dispatch")

    scanned = cached_jit(
        ("scanned_train_step", model, optim_cfg, K, acc, mesh),
        lambda: jax.jit(
            make_scanned_train_step(model, cfg, optimizer, K,
                                    grad_acc_step=acc),
            donate_argnums=0,
            out_shardings=(state_shardings, replicated)))

    shuffle_rng = np.random.RandomState(1234 + step)

    def stream(g):
        while True:
            for i in shuffle_rng.permutation(g["n"]):
                yield int(i)

    streams = [stream(g) for g in glist]
    weights = np.array([g["n"] / n_total for g in glist])
    credit = np.zeros(len(glist))

    while step < total_step and not preempted.is_set():
        k = min(K, total_step - step)
        credit += weights
        gi = int(np.argmax(credit))
        credit[gi] -= 1.0
        g = glist[gi]
        idx = np.fromiter((next(streams[gi]) for _ in range(k)),
                          np.int32, count=k)
        state, losses_seq = scanned(state, g["stacked"],
                                    jnp.asarray(idx), rng)
        step += k
        losses = jax.tree_util.tree_map(lambda a: a[-1], losses_seq)
        run_duties(step, losses, g["raw0"], state,
                   int(g["frames"][idx].sum()))
    return state, step


def evaluate(eval_step, state, val_dataset, preprocess_config, batch_size,
             cfg):
    """Sample-weighted mean val losses (evaluate.py:37-51)."""
    loader = BucketedLoader(
        val_dataset, batch_size=batch_size, group_size=1, shuffle=False,
        drop_last=False, max_mel_len=cfg.max_seq_len)
    sums = np.zeros(6)
    count = 0
    for batch in loader.epoch(0):
        n = batch.get("valid_count", batch["texts"].shape[0])
        losses = eval_step(state, _model_batch(batch), jnp.int32(n))
        sums += np.array([float(v) for v in losses]) * n
        count += n
    return (sums / max(count, 1)).tolist()
