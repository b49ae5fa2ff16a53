"""PPO: clipped-surrogate policy optimization over collected rollouts.

Capability parity with the reference PPO (reference: ppo.py:24-488):
clipped surrogate per action head, critic losses (two-hot CE / HL-Gauss /
clipped|huber L2 with EMA value normalization), entropy bonus, epoch /
minibatch fori loops with shuffled whole-sequence minibatches, advantage
filtering, trajectory importance sampling, fp16 dynamic loss scaling,
post-step weight-norm projection and LayerNorm scale/bias renormalization.

TPU-native deviations:
- The optimizer chain is learning-rate-free; the on-device per-policy
  ``hyper_params.lr`` scales the update (see train_state.py docstring), so
  PBT lr mutations actually take effect and per-policy lrs shard over the
  population axis.
- ``entropy_coef`` is an on-device scalar hyperparameter (PBT-mutable),
  optionally weighted per action key by the static ``entropy_key_weights``
  dict (the reference hardcodes a static per-key dict, making entropy
  exploration a no-op; reference: ppo.py:231-239).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax import lax, random

from .algo import AlgoBase, HyperParams
from .config import AlgoConfig, ParamExplore, TrainConfig
from .ops.gae import zscore_data
from .ops.metrics import Metric, TrainingMetrics
from .pbt import explore_param
from .rollouts import RolloutData
from .train_state import PolicyState, PolicyTrainState
from .utils.profile import profile

__all__ = ["PPOConfig", "PPO"]


@dataclass(frozen=True)
class PPOConfig(AlgoConfig):
    num_epochs: int
    minibatch_size: int
    clip_coef: float
    value_loss_coef: float
    entropy_coef: Union[float, ParamExplore]
    max_grad_norm: float
    clip_value_loss: bool = False
    huber_value_loss: bool = False
    # Optional static per-action-key entropy weights multiplying the scalar
    # entropy_coef hyperparameter.
    entropy_key_weights: Optional[Dict[str, float]] = None

    def name(self):
        return "ppo"

    def setup(self):
        return PPO()

    def explore_hyperparams(self, rnd, hyper_params, resample_chance):
        """PBT mutation hook for PPO-specific hyperparameters."""
        if isinstance(self.entropy_coef, ParamExplore):
            hyper_params = hyper_params.replace(
                entropy_coef=explore_param(
                    rnd, hyper_params.entropy_coef, self.entropy_coef,
                    resample_chance))
        return hyper_params


class PPOHyperParams(HyperParams):
    clip_coef: float
    value_loss_coef: float
    entropy_coef: float
    max_grad_norm: float


class PPO(AlgoBase):
    def init_hyperparams(self, cfg: TrainConfig):
        if cfg.dreamer_v3_critic or cfg.hlgauss_critic:
            assert not cfg.algo.clip_value_loss
            assert not cfg.algo.huber_value_loss
            assert not cfg.normalize_values

        lr = cfg.lr.base if isinstance(cfg.lr, ParamExplore) else cfg.lr
        entropy = (cfg.algo.entropy_coef.base
                   if isinstance(cfg.algo.entropy_coef, ParamExplore)
                   else cfg.algo.entropy_coef)

        return PPOHyperParams(
            lr=jnp.float32(lr),
            gamma=cfg.gamma,
            gae_lambda=cfg.gae_lambda,
            normalize_values=cfg.normalize_values,
            value_normalizer_decay=cfg.value_normalizer_decay,
            max_advantage_est_decay=cfg.max_advantage_est_decay,
            clip_coef=jnp.float32(cfg.algo.clip_coef),
            value_loss_coef=jnp.float32(cfg.algo.value_loss_coef),
            entropy_coef=jnp.float32(entropy),
            max_grad_norm=cfg.algo.max_grad_norm,
        )

    def make_optimizer(self, hyper_params):
        # Learning-rate-free: clip + adam moment scaling only. The step is
        # multiplied by the live per-policy hyper_params.lr in _ppo_update.
        return optax.chain(
            optax.clip_by_global_norm(hyper_params.max_grad_norm),
            optax.scale_by_adam(),
        )

    def update(self, *args, **kwargs):
        return _ppo(*args, **kwargs)

    def add_metrics(self, cfg: TrainConfig, metrics: FrozenDict):
        return metrics.copy({
            "Loss": Metric.init(True),
            "Action Obj": Metric.init(True),
            "Value Loss": Metric.init(True),
            "Value Errors": Metric.init(True),
            "Entropy": Metric.init(True),
        })


def resolve_stratify(cfg: TrainConfig, num_train_seqs_per_policy: int,
                     store_bytes_estimate: Optional[int] = None) -> int:
    """Effective uniform-mode minibatch stratification block count.

    1 = the legacy single global shuffle (bit-identical PRNG stream to the
    reference semantics). >1 = the per-policy sequences are treated as that
    many equal contiguous blocks, each epoch shuffles every block
    independently, and each minibatch takes an equal slice of every block
    — the composition that lets a data shard owning whole blocks select
    its minibatch rows with zero collectives inside the manual learn
    region (train.py:learn_manual). The composition is a pure function of
    (config, PRNG), NEVER of the execution layout, so single-device,
    GSPMD, and manual-region runs of the same config stay bit-equal.

    Falls back to 1 (with a trace-time warning) when the sequence count or
    minibatch size does not divide into the blocks; advantage filtering /
    importance sampling always use their global selections.
    """
    if cfg.filter_advantages or cfg.importance_sample_trajectories:
        return 1
    stratify = cfg.minibatch_stratify
    if stratify is None:
        mesh = cfg.mesh
        # model folds into the row split inside the manual learn region
        # (train._learn_row_axes), so the default block count covers both.
        stratify = (mesh.data * mesh.model
                    if mesh is not None and mesh.num_devices > 1 else 1)
    stratify = max(int(stratify), 1)
    if stratify == 1:
        return 1
    if (num_train_seqs_per_policy % stratify != 0
            or cfg.algo.minibatch_size % stratify != 0):
        import warnings

        # On a pod the consequence is concrete: the manual region's entry
        # replicates the full train store over ``data`` instead of taking
        # a 1/data slice per device — state the bytes, not just the fact.
        cost = ""
        if (store_bytes_estimate is not None and cfg.mesh is not None
                and cfg.mesh.data > 1):
            d = cfg.mesh.data
            full_mb = store_bytes_estimate / 1e6
            cost = (
                f" At this shape that means ~{full_mb:.1f} MB of rollout "
                f"store per device (obs-dominated estimate) instead of the "
                f"~{full_mb / d:.1f} MB 1/{d} slice stratification would "
                f"keep — {(d - 1) / d * full_mb:.1f} MB extra per device "
                f"plus the all-gather to materialize it.")
        warnings.warn(
            f"minibatch stratification disabled: stratify={stratify} must "
            f"divide both the per-policy training sequences "
            f"({num_train_seqs_per_policy}) and minibatch_size "
            f"({cfg.algo.minibatch_size}); falling back to the single "
            f"global shuffle (the manual learn region, if active, will "
            f"replicate rollout data over the data axis).{cost}")
        return 1
    return stratify


def _scaler_value_and_grad_manual(scaler, loss_fn, params, data_axis):
    """fp16 DynamicScale step inside the manual shard_map learn region.

    ``loss_fn`` pmeans the loss value over ``data_axis``, so each shard's
    AD yields the gradient of its local minibatch-slice mean and the
    global mean's gradient is the *pmean* of the shard gradients (same
    contract as the non-scaled branch in _ppo_update; this matches what
    flax's ``value_and_grad(axis_name=...)`` does for pmap). This
    reimplements the flax wrapper
    (flax/training/dynamic_scale.py::DynamicScale.value_and_grad; scale
    update rule reproduced exactly): differentiate the scaled loss, pmean
    the unscaled fp32 shard gradients, then derive finiteness — and hence
    the scale/fin_steps update — from the GLOBAL gradient. The collective
    propagates non-finite entries to every shard, so ``is_finite`` and the
    new scale are shard-invariant by construction, with no extra
    collective: every shard steps its replicated DynamicScale identically.

    Returns ``(new_scaler, is_finite, (loss, aux), grads)`` with the same
    shapes/dtypes as the flax wrapper (fp32 unscaled grads).
    """
    scale = scaler.scale

    def scaled_loss_fn(p):
        loss, aux_inner = loss_fn(p)
        return scale * loss, aux_inner

    aux, grads = jax.value_and_grad(scaled_loss_fn, has_aux=True)(params)
    aux = (aux[0] / scale, aux[1])
    grads = jax.tree.map(
        lambda g: lax.pmean(jnp.asarray(g, jnp.float32) / scale, data_axis),
        grads)

    is_finite = jnp.array(True)
    for g in jax.tree.leaves(grads):
        is_finite &= jnp.all(lax.is_finite(g))

    grow = scaler.fin_steps == scaler.growth_interval
    fin_scale = jnp.where(
        grow & is_finite,
        jnp.minimum(scale * scaler.growth_factor,
                    jnp.finfo(jnp.float32).max),
        scale)
    inf_scale = scale * scaler.backoff_factor
    if scaler.minimum_scale is not None:
        inf_scale = jnp.maximum(inf_scale, scaler.minimum_scale)
    new_scaler = scaler.replace(
        scale=jnp.where(is_finite, fin_scale, inf_scale),
        fin_steps=jnp.where(grow | (~is_finite), 0, scaler.fin_steps + 1))
    return new_scaler, is_finite, aux, grads


def _zero_sharded_opt_update(hp, grads, opt_state, params, data_axis,
                             zero_rows):
    """ZeRO-1 optimizer step: Adam moments sharded over the replica axes.

    Active inside the manual learn region when
    ``MeshConfig.zero_opt_state`` (docs/scaling.md "ZeRO optimizer-state
    sharding"). ``opt_state`` is the (clip, adam) chain state with mu/nu
    leaves in the chunked per-device layout ``[1, ceil(size/R)]``
    (train_state.chunk_adam_moments; the sharded axis is size 1 inside the
    region). Per leaf, each replica obtains its chunk of the GLOBAL mean
    gradient via psum_scatter — which both performs the reduction the
    replicated path's pmean did and distributes chunks in the exact order
    the closing all_gather reassembles, so no explicit axis-index
    arithmetic can drift out of sync. (When ``grads`` already are global —
    the fp16 DynamicScale path pmeans inside its unscale step — the
    psum_scatter of R identical copies divided by R degenerates to an
    order-safe slice.) The global-norm clip uses the norm assembled across
    chunks (bitwise-same rule as optax.clip_by_global_norm), Adam runs
    elementwise on the chunk, and the assembled update is all_gathered.

    Communication per step: reduce_scatter(P) + all_gather(P) — the same
    bytes the replicated path's gradient pmean moves (a pmean IS
    reduce_scatter + all_gather), so the budget is unchanged on the
    non-scaler path. Per-device moment memory drops from 2x params to
    2x/R. Padded tail entries see zero gradients, keep zero moments, and
    never enter the assembled update's used prefix.
    """
    assert data_axis is not None
    clip_state, adam_state = opt_state

    def to_chunk(g):
        flat = g.astype(jnp.float32).reshape(-1)
        pad = (-flat.size) % zero_rows
        if pad:
            flat = jnp.pad(flat, (0, pad))
        chunk = lax.psum_scatter(flat, data_axis, scatter_dimension=0,
                                 tiled=True)
        return chunk / zero_rows

    grad_chunks = jax.tree.map(to_chunk, grads)

    # Global-norm clip, exactly optax.clip_by_global_norm's rule with the
    # norm assembled across this replica group's chunks.
    sumsq = sum(jnp.sum(jnp.square(c)) for c in jax.tree.leaves(grad_chunks))
    g_norm = jnp.sqrt(lax.psum(sumsq, data_axis))
    trigger = g_norm < hp.max_grad_norm
    clipped = jax.tree.map(
        lambda c: lax.select(trigger, c, (c / g_norm) * hp.max_grad_norm),
        grad_chunks)

    # Adam on the local chunk only (same defaults as PPO.make_optimizer's
    # scale_by_adam; the count scalar stays replicated).
    local_state = adam_state._replace(
        mu=jax.tree.map(lambda x: x[0], adam_state.mu),
        nu=jax.tree.map(lambda x: x[0], adam_state.nu))
    upd_chunks, new_local = optax.scale_by_adam().update(
        clipped, local_state)
    new_adam = new_local._replace(
        mu=jax.tree.map(lambda x: x[None], new_local.mu),
        nu=jax.tree.map(lambda x: x[None], new_local.nu))

    def assemble(u, p):
        full = lax.all_gather(u, data_axis, tiled=True)
        return full[:p.size].reshape(p.shape)

    param_updates = jax.tree.map(assemble, upd_chunks, params)
    return param_updates, (clip_state, new_adam)


def _ppo_update(
    cfg: TrainConfig,
    mb: FrozenDict,
    mb_weights: jax.Array,
    policy_state: PolicyState,
    train_state: PolicyTrainState,
    metrics: TrainingMetrics,
    data_axis: Optional[str] = None,
    mb_mask: Optional[jax.Array] = None,
):
    # Per-trajectory weights must enter as [mb, 1] so they broadcast against
    # the time-major [T, mb, ...] per-element losses as one weight per
    # trajectory. A 1-D [mb] here silently broadcasts to [T, mb, mb],
    # degenerating every weighted mean to mean(w) * mean(loss) and blowing up
    # memory by mb x. Static shapes make this checkable at trace time.
    assert mb_weights.ndim == 2 and mb_weights.shape[-1] == 1, (
        f"mb_weights must be [minibatch, 1], got {mb_weights.shape}")

    # Inside a manual (shard_map) learn region, ``mb`` holds this data
    # shard's equal slice of the global minibatch; every reduction below
    # pmean/psums over ``data_axis`` so losses, gradients, normalizer
    # updates, and metrics equal the single-device computation exactly
    # (fp16 DynamicScale included — see _scaler_value_and_grad_manual).
    #
    # ``mb_mask`` ([mb, 1]; 1 = real row, 0 = padding) appears when the
    # global minibatch does not divide evenly over the mesh row shards, so
    # each shard processes ceil(MB/D) rows with trailing zero-weight pads.
    # Every reduction then switches from means to (p)summed sums over
    # real-element counts, so pads never bias a denominator — the update
    # equals the unpadded single-device one (mb_weights already carry the
    # mask factor; see _ppo).

    if mb_mask is not None:
        assert mb_mask.ndim == 2 and mb_mask.shape[-1] == 1, (
            f"mb_mask must be [minibatch, 1], got {mb_mask.shape}")

    def global_mean(x, **kwargs):
        if mb_mask is not None:
            # x already carries mb_weights (with the mask folded in); the
            # denominator counts REAL elements of the broadcast shape.
            x = x.astype(jnp.float32)
            shape = jnp.broadcast_shapes(x.shape, mb_mask.shape)
            num = jnp.sum(jnp.broadcast_to(x, shape))
            cnt = jnp.sum(jnp.broadcast_to(
                mb_mask.astype(jnp.float32), shape))
            if data_axis is not None:
                num = lax.psum(num, data_axis)
                cnt = lax.psum(cnt, data_axis)
            return num / jnp.maximum(cnt, 1.0)
        m = jnp.mean(x, **kwargs)
        if data_axis is not None:
            m = lax.pmean(m, data_axis)
        return m

    value_norm = train_state.value_normalizer
    hp = train_state.hyper_params

    def fwd_pass(params):
        with profile("AC Forward"):
            return policy_state.apply_fn(
                {"params": params, "batch_stats": policy_state.batch_stats},
                mb["rnn_start_states"], mb["dones"], mb["actions"], mb["obs"],
                train=True,
                method="update",
                mutable=["batch_stats"],
            )

    def loss_fn(params):
        fwd_results, mutated = fwd_pass(params)
        new_log_probs = fwd_results["log_probs"]
        entropies = fwd_results["entropies"]

        if cfg.compute_advantages:
            advantages = mb["advantages"].astype(jnp.float32)
            if cfg.normalize_advantages:
                advantages = zscore_data(advantages, axis_name=data_axis,
                                         mask=mb_mask)
        else:
            advantages = mb["returns"].astype(jnp.float32)
            if cfg.normalize_returns:
                advantages = zscore_data(advantages, axis_name=data_axis,
                                         mask=mb_mask)

        def surrogate(new_lp, old_lp):
            old_lp = old_lp.astype(jnp.float32)
            ratio = jnp.exp(new_lp - old_lp)

            scores = advantages
            if ratio.ndim - 2 > 1:
                scores = scores[..., None]

            clipped_ratio = jnp.clip(
                ratio,
                1.0 - hp.clip_coef.astype(ratio.dtype),
                1.0 + hp.clip_coef.astype(ratio.dtype))
            return jnp.minimum(scores * ratio, scores * clipped_ratio)

        action_objs = jax.tree.map(surrogate, new_log_probs, mb["log_probs"])

        # -- critic loss -----------------------------------------------------
        if cfg.dreamer_v3_critic:
            dist = fwd_results["critic"]
            value_losses = dist.two_hot_cross_entropy_loss(mb["returns"])
            value_errs = dist.mean() - mb["returns"]
            new_value_norm_state = None
        elif cfg.hlgauss_critic:
            dist = fwd_results["critic"]
            value_losses = dist.loss(mb["returns"])
            value_errs = dist.mean() - mb["returns"]
            new_value_norm_state = None
        else:
            assert fwd_results["critic"].shape[-1] == 1
            new_values_norm = fwd_results["critic"]

            if value_norm is None:
                value_errs = new_values_norm - mb["returns"]
            else:
                value_errs = (
                    value_norm.invert(
                        train_state.value_normalizer_state, new_values_norm)
                    - mb["returns"])

            if cfg.algo.clip_value_loss:
                old_values_norm = mb["values"]
                new_values_norm = jnp.clip(
                    new_values_norm,
                    old_values_norm - hp.clip_coef,
                    old_values_norm + hp.clip_coef)

            if value_norm is None:
                normalized_returns = mb["returns"]
                new_value_norm_state = None
            else:
                new_value_norm_state, normalized_returns = (
                    value_norm.normalize_and_update_estimates(
                        train_state.value_normalizer_state, mb["returns"],
                        axis_name=data_axis, mask=mb_mask))

            if cfg.algo.huber_value_loss:
                value_losses = optax.huber_loss(
                    new_values_norm, normalized_returns)
            else:
                value_losses = optax.l2_loss(
                    new_values_norm, normalized_returns)

        # -- reductions ------------------------------------------------------
        def reduce_action_objs(objs):
            return sum(
                global_mean(mb_weights * o.astype(jnp.float32))
                for o in jax.tree.leaves(objs))

        def reduce_entropies(entropies):
            key_weights = cfg.algo.entropy_key_weights or {}
            if hasattr(entropies, "keys"):
                total = 0.0
                for k in entropies.keys():
                    w = key_weights.get(k, 1.0)
                    total = total + w * global_mean(
                        mb_weights * entropies[k].astype(jnp.float32))
            else:
                total = global_mean(mb_weights * entropies.astype(jnp.float32))
            return hp.entropy_coef * total

        action_obj_avg = reduce_action_objs(action_objs)
        value_loss = global_mean(mb_weights * value_losses, dtype=jnp.float32)
        entropy_avg = reduce_entropies(entropies)

        loss = (
            -action_obj_avg
            + hp.value_loss_coef * value_loss
            - entropy_avg
        )

        return loss, (
            mutated["batch_stats"],
            new_value_norm_state,
            loss,
            action_objs,
            value_losses,
            entropies,
            value_errs,
        )

    with profile("Optimize"):
        params = policy_state.params
        scaler = train_state.scaler
        opt_state = train_state.opt_state
        zero_rows = cfg.mesh.zero_rows if cfg.mesh is not None else 1

        if scaler is not None and data_axis is None:
            grad_fn = scaler.value_and_grad(loss_fn, has_aux=True)
            scaler, is_finite, aux, grads = grad_fn(params)
        elif scaler is not None:
            scaler, is_finite, aux, grads = _scaler_value_and_grad_manual(
                scaler, loss_fn, params, data_axis)
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            aux, grads = grad_fn(params)
            if data_axis is not None and zero_rows == 1:
                # loss_fn's pmeans make the loss *value* global, but each
                # shard's AD (check_vma=False transpose semantics) yields
                # the gradient of its LOCAL minibatch-slice mean; the
                # global mean's gradient is the pmean of those. (A psum
                # here scales gradients by the shard count — invisible
                # through scale-invariant Adam, but it moves the
                # max_grad_norm clipping threshold; caught by
                # test_manual_dynamic_scale_matches_flax's flax oracle.)
                # With zero_rows > 1 this pmean folds into the
                # psum_scatter inside _zero_sharded_opt_update — the same
                # reduction, scattered.
                grads = jax.tree.map(
                    lambda g: lax.pmean(g, data_axis), grads)

        with jax.numpy_dtype_promotion("standard"):
            if zero_rows > 1:
                param_updates, new_opt_state = _zero_sharded_opt_update(
                    hp, grads, opt_state, params, data_axis, zero_rows)
            else:
                param_updates, new_opt_state = train_state.tx.update(
                    grads, opt_state, params)
            # Apply the live per-policy learning rate (see module docstring).
            param_updates = jax.tree.map(
                lambda u: -hp.lr * u, param_updates)
        new_params = optax.apply_updates(params, param_updates)

        if scaler is not None:
            where_finite = partial(jnp.where, is_finite)
            new_params = jax.tree.map(where_finite, new_params, params)
            new_opt_state = jax.tree.map(
                where_finite, new_opt_state, opt_state)

        (new_batch_stats, new_value_norm_state, combined_loss, action_objs,
         value_losses, entropies, value_errs) = aux[1]

        # Project every tracked kernel back to its initial L2 norm
        # (keeps effective learning rate stable; reference: ppo.py:303-310).
        def normalize_param(init_norm, param):
            if init_norm is None:
                return param
            return init_norm * param / jnp.linalg.vector_norm(param, ord=2)

        # initial_weight_norms drives the traversal so its None entries (no
        # projection) are visited as leaves.
        new_params = jax.tree.map(
            normalize_param, train_state.initial_weight_norms, new_params,
            is_leaf=lambda x: x is None)

        # Renormalize LayerNorm scale/bias vectors to a constant joint norm
        # (reference: ppo.py:312-338).
        def renorm_layernorms(d):
            if not isinstance(d, dict):
                return d
            new = {}
            for k, v in d.items():
                if "LayerNorm" in k:
                    bias = v["impl"]["bias"]
                    scale = v["impl"]["scale"]
                    num_features = scale.shape[-1]
                    factor = jnp.sqrt(num_features / (
                        jnp.dot(bias, bias) + jnp.dot(scale, scale)))
                    new[k] = {"impl": {
                        "bias": factor * bias,
                        "scale": factor * scale,
                    }}
                else:
                    new[k] = renorm_layernorms(v)
            return new

        new_params = renorm_layernorms(new_params)

        policy_state = policy_state.update(
            params=new_params, batch_stats=new_batch_stats)
        train_state = train_state.update(
            value_normalizer_state=new_value_norm_state,
            opt_state=new_opt_state,
            scaler=scaler,
        )

    with profile("Record Metrics"):
        # The loss scalar is already global (pmean'd inside loss_fn); the
        # per-element arrays are this shard's slice, so only they need the
        # cross-shard Welford merge (and, with padded rows, the mask).
        def flat_concat(tree):
            return jnp.concatenate(
                [x.reshape(-1, x.shape[-1])
                 for x in jax.tree.leaves(tree)], axis=-1)

        masks = None
        if mb_mask is not None:
            def flat_mask(tree):
                return jnp.concatenate(
                    [jnp.broadcast_to(mb_mask, x.shape).reshape(
                        -1, x.shape[-1])
                     for x in jax.tree.leaves(tree)], axis=-1)

            masks = {
                "Action Obj": flat_mask(action_objs),
                "Value Loss": jnp.broadcast_to(
                    mb_mask, value_losses.shape),
                "Value Errors": jnp.broadcast_to(mb_mask, value_errs.shape),
                "Entropy": flat_mask(entropies),
            }
        metrics = metrics.record({"Loss": combined_loss})
        metrics = metrics.record({
            "Action Obj": flat_concat(action_objs),
            "Value Loss": value_losses,
            "Value Errors": jnp.abs(value_errs),
            "Entropy": flat_concat(entropies),
        }, axis_name=data_axis, masks=masks)

    return policy_state, train_state, metrics


def _ppo(
    cfg: TrainConfig,
    policy_state: PolicyState,
    train_state: PolicyTrainState,
    rollout_data: RolloutData,
    user_metrics_cb: Callable,
    init_metrics: TrainingMetrics,
    data_axis: Optional[str] = None,
    stratify: int = 1,
    rows_sharded: bool = False,
):
    """Epoch/minibatch optimization for one policy (vmapped over policies).

    Minibatch index selection supports three modes (reference:
    ppo.py:374-443): advantage filtering (train only on sequences whose |adv|
    clears a threshold tied to an EMA of the max advantage), trajectory
    importance sampling (sample sequences by |adv| + value error, weighted to
    stay unbiased), or uniform shuffled minibatches.

    With ``data_axis`` (inside the manual shard_map learn region, see
    train.py), every shard computes the same per-epoch permutation from the
    replicated per-policy PRNG, then optimizes its equal slice of each
    global minibatch; _ppo_update restores global semantics with
    psums/pmeans over the axis. All three index-selection modes work
    there — filter argsort / max-advantage EMA and the importance-sampling
    draw compute the identical global index set and trajectory weights on
    every shard from replicated rollout data + PRNG; only the minibatch
    *rows* each shard optimizes differ (its equal slice). Equality tests:
    tests/test_sharding.py::test_manual_learn_minibatch_modes_match_gspmd.

    Uniform mode additionally supports STRATIFIED composition
    (``stratify`` > 1, from ``resolve_stratify``): sequences form
    ``stratify`` equal contiguous blocks, shuffled independently per
    epoch, each minibatch drawing an equal slice of every block. With
    ``rows_sharded`` (manual region, data shard owns ``stratify /
    axis_size`` whole blocks) each shard selects its rows from its LOCAL
    slice of the store — zero collectives where the replicated entry paid
    a full-store all-gather at the region boundary. The composition is
    identical either way (pure function of config + PRNG).
    """
    assert not rows_sharded or not (
        cfg.filter_advantages or cfg.importance_sample_trajectories), (
        "rows_sharded applies to uniform minibatches only; advantage "
        "filtering / importance sampling need the replicated store "
        "(train.py gates this)")
    if cfg.filter_advantages:
        rollout_data = rollout_data.flatten_time()

        advantages = rollout_data.all()["advantages"]
        advantages_abs = jnp.abs(advantages)
        max_advantages = jnp.max(advantages_abs)

        est_state = train_state.max_advantage_est.update_estimates(
            train_state.max_advantage_est_state, max_advantages)
        train_state = train_state.update(max_advantage_est_state=est_state)
        cur_max_est = est_state["mu"]

        adv_flat = advantages_abs.reshape(-1)
        sorted_idxs = jnp.argsort(adv_flat, descending=True)
        num_above = jnp.sum(
            jnp.where(adv_flat >= 0.01 * cur_max_est, 1, 0))

        num_minibatches = jnp.minimum(
            (num_above + cfg.algo.minibatch_size - 1)
            // cfg.algo.minibatch_size,
            adv_flat.size // cfg.algo.minibatch_size)
        num_datapoints = num_minibatches * cfg.algo.minibatch_size
        valid_inds = jnp.where(
            jnp.arange(adv_flat.size) < num_datapoints, sorted_idxs, -1)
        traj_weights = jnp.ones((advantages.shape[0], 1), jnp.float32)
    elif cfg.importance_sample_trajectories:
        advantages = rollout_data.all()["advantages"].astype(jnp.float32)
        values = rollout_data.all()["values"].astype(jnp.float32)
        returns = rollout_data.all()["returns"].astype(jnp.float32)

        num_total = advantages.shape[0]
        num_minibatches = cfg.importance_sample_num_minibatches
        num_sampled = num_minibatches * cfg.algo.minibatch_size
        assert num_sampled < num_total and num_minibatches > 0

        traj_scores = (
            jnp.mean(jnp.abs(advantages).reshape(num_total, -1), axis=1)
            + jnp.mean(jnp.abs(values - returns).reshape(num_total, -1),
                       axis=1))
        traj_probs = jax.nn.softmax(traj_scores, axis=0)
        # Unbiasedness correction: E_sample[w_i * loss_i] = mean_i loss_i.
        # Shaped [num_total, 1] so each weight applies to a whole trajectory
        # (reference: ppo.py:407-435).
        traj_weights = ((1.0 / num_total) / traj_probs)[:, None]

        sample_rnd, train_state = train_state.gen_update_rnd()
        valid_inds = random.choice(
            sample_rnd, num_total, shape=(num_sampled,), replace=False,
            p=traj_probs)
    else:
        num_local_rows = rollout_data.all()["dones"].shape[0]
        num_shards = lax.axis_size(data_axis) if rows_sharded else 1
        num_trajectories = num_local_rows * num_shards
        assert num_trajectories % cfg.algo.minibatch_size == 0, (
            f"minibatch_size ({cfg.algo.minibatch_size}) must evenly divide "
            f"the {num_trajectories} training sequences per policy "
            f"(= num_bptt_chunks * train agents per policy)")
        num_minibatches = num_trajectories // cfg.algo.minibatch_size
        if rows_sharded:
            assert stratify > 1 and stratify % num_shards == 0, (
                f"rows_sharded needs stratify ({stratify}) divisible by "
                f"the data axis ({num_shards})")
        valid_inds = jnp.arange(num_trajectories)
        traj_weights = jnp.ones((num_local_rows, 1), jnp.float32)

    def uniform_stratified_inds(mb_rnd):
        """Per-epoch minibatch index stream, stratified composition.

        Every path derives the SAME [stratify, block] permutations from the
        replicated PRNG; the flattened stream orders each minibatch
        block-major, so a contiguous [mb_i*MB, (mb_i+1)*MB) slice is
        minibatch i and the data shard owning blocks [s*k, (s+1)*k) holds
        exactly its [s*MB/D, (s+1)*MB/D) sub-slice — the two layouts index
        identical rows.
        """
        block = num_trajectories // stratify  # rows per block
        per_mb = cfg.algo.minibatch_size // stratify  # block rows per mb
        keys = random.split(mb_rnd, stratify)
        perms = jax.vmap(
            lambda key: random.permutation(key, block))(keys)
        if rows_sharded:
            # This shard owns whole blocks; emit LOCAL row ids.
            blocks_here = stratify // num_shards
            perms = lax.dynamic_slice(
                perms, (lax.axis_index(data_axis) * blocks_here, 0),
                (blocks_here, block))
        ids = jnp.arange(perms.shape[0])[:, None] * block + perms
        # [blocks, num_mb, per_mb] -> [num_mb, blocks, per_mb] -> flat
        ids = ids.reshape(perms.shape[0], num_minibatches, per_mb)
        return ids.transpose(1, 0, 2).reshape(-1)

    uniform_mode = not (cfg.filter_advantages
                        or cfg.importance_sample_trajectories)

    def epoch_iter(epoch_i, inputs):
        policy_state, train_state, metrics = inputs

        mb_rnd, train_state = train_state.gen_update_rnd()

        with profile("Compute Minibatch Indices"):
            if uniform_mode and stratify > 1:
                rnd_inds = uniform_stratified_inds(mb_rnd)
            else:
                rnd_inds = random.permutation(mb_rnd, valid_inds)
                if cfg.filter_advantages:
                    # Push -1 sentinels to the back, keeping shuffled order.
                    keys = jnp.where(rnd_inds == -1, 1, 0)
                    rnd_inds = rnd_inds[jnp.argsort(keys, stable=True)]

        def mb_iter(mb_i, inputs):
            policy_state, train_state, metrics = inputs
            mb_mask = None

            with profile("Gather Minibatch"):
                if data_axis is None:
                    mb_inds = lax.dynamic_slice(
                        rnd_inds, (mb_i * cfg.algo.minibatch_size,),
                        (cfg.algo.minibatch_size,))
                elif rows_sharded:
                    # rnd_inds are already this shard's local row ids for
                    # its slice of every minibatch (uniform_stratified_inds)
                    # — a zero-collective local gather from the
                    # data-sharded store.
                    local_size = (cfg.algo.minibatch_size
                                  // lax.axis_size(data_axis))
                    mb_inds = lax.dynamic_slice(
                        rnd_inds, (mb_i * local_size,), (local_size,))
                elif cfg.algo.minibatch_size % lax.axis_size(data_axis) == 0:
                    # Equal disjoint slice of the global minibatch for this
                    # data shard: the permutation is replicated, the rows
                    # are local (rollout_data enters the manual region
                    # replicated over data).
                    num_shards = lax.axis_size(data_axis)
                    local_size = cfg.algo.minibatch_size // num_shards
                    mb_inds = lax.dynamic_slice(
                        rnd_inds,
                        (mb_i * cfg.algo.minibatch_size
                         + lax.axis_index(data_axis) * local_size,),
                        (local_size,))
                else:
                    # Non-dividing minibatch: each shard takes ceil(MB/D)
                    # rows; trailing positions past MB duplicate the
                    # minibatch's last row with weight/mask 0, and every
                    # reduction downstream switches to psum(sum)/psum(real
                    # count) so pads never bias a denominator
                    # (VERDICT r3 item 4).
                    num_shards = lax.axis_size(data_axis)
                    mb_size = cfg.algo.minibatch_size
                    local_size = -(mb_size // -num_shards)
                    pos = (lax.axis_index(data_axis) * local_size
                           + jnp.arange(local_size))
                    valid = pos < mb_size
                    flat_pos = mb_i * mb_size + jnp.minimum(pos, mb_size - 1)
                    mb_inds = jnp.take(rnd_inds, flat_pos, mode="clip")
                    mb_mask = valid.astype(jnp.float32)[:, None]
                mb = rollout_data.minibatch(mb_inds)
                mb_weights = traj_weights[mb_inds]
                if mb_mask is not None:
                    mb_weights = mb_weights * mb_mask

            policy_state, train_state, metrics = _ppo_update(
                cfg, mb, mb_weights, policy_state, train_state, metrics,
                data_axis=data_axis, mb_mask=mb_mask)

            with profile("Metrics Callback"):
                metrics = user_metrics_cb(
                    metrics, epoch_i, mb, policy_state, train_state)

            return policy_state, train_state, metrics

        return lax.fori_loop(
            0, num_minibatches, mb_iter,
            (policy_state, train_state, metrics))

    policy_state, train_state, metrics = lax.fori_loop(
        0, cfg.algo.num_epochs, epoch_iter,
        (policy_state, train_state, init_metrics))

    return policy_state, train_state, metrics
