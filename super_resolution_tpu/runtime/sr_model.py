"""SR runner layer — the L5 strategy objects driving networks.

TPU-native replacement for the reference's model hierarchy
(ref: basicsr/models/sr_model.py:14-279, hat/models/hat_model.py:13-186).
Instead of stateful nn.Modules moved across devices, a runner holds a flax
module + param pytrees and a cache of jit-compiled apply functions; all
padding/tiling/ensembling is expressed as jax ops so entire images are
processed without host round-trips.

Runner names keep the reference's MODEL_REGISTRY strings (`model_type:
HATModel` etc.) so the YAML configs drive this framework unchanged.
"""

from __future__ import annotations

import os
from copy import deepcopy
from os import path as osp
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.metrics import calculate_metric
from super_resolution_tpu.models import build_network
from super_resolution_tpu.runtime.tile import tile_forward
from super_resolution_tpu.utils import get_root_logger, imwrite, tensor2img
from super_resolution_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class SRModel:
    """Single-network SR runner (inference/validation core).

    Training members (optimizer/EMA/losses) are attached by the train
    pipeline via setup_training (runtime/train_loop.py).
    """

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale", 1)
        self.is_train = opt.get("is_train", False)
        self.logger = get_root_logger()
        self.net_g = build_network(opt["network_g"])

        self.params: Any = None
        self.ema_params: Any = None
        self._apply_cache: dict = {}
        self.metric_results: dict = {}
        self.best_metric_results: dict = {}

        self._init_params()
        load_path = self.opt["path"].get("pretrain_network_g")
        if load_path:
            param_key = self.opt["path"].get("param_key_g", "params")
            self.load_network(load_path, param_key=param_key,
                              strict=self.opt["path"].get("strict_load_g", True))

    # ------------------------------------------------------------------ init
    def _example_input(self):
        ws = self.opt["network_g"].get("window_size", 8) or 8
        return jnp.zeros((1, ws * 2, ws * 2, 3), jnp.float32)

    def _init_params(self):
        rng = jax.random.PRNGKey(self.opt.get("manual_seed") or 0)
        variables = self.net_g.init(rng, self._example_input())
        self.params = variables["params"]

    def load_network(self, load_path: str, param_key: str = "params",
                     strict: bool = True):
        from super_resolution_tpu.convert import load_torch_checkpoint

        self.logger.info(f"Loading {self.net_g.__class__.__name__} from "
                         f"{load_path} (param_key={param_key})")
        if load_path.endswith(".pth"):
            self.params = load_torch_checkpoint(load_path, self.params,
                                                param_key=param_key,
                                                strict=strict)
        else:  # orbax native checkpoint directory
            from super_resolution_tpu.runtime.checkpoint import load_params
            self.params = load_params(load_path, self.params, param_key)

    # -------------------------------------------------------------- forward
    def _sync_from_state(self):
        """PP mode trains on the {'stages','rest'} layout (stage slices
        sharded over 'pipe'); merge back to the flax tree only when the
        inference/checkpoint path actually needs it."""
        if getattr(self, "_pp_params_stale", False):
            from super_resolution_tpu.parallel.pipeline import merge_pp_params

            self.params = merge_pp_params(self.net_g, self.state.params)
            if self.ema_decay > 0 and self.state.ema_params is not None:
                self.ema_params = merge_pp_params(self.net_g,
                                                  self.state.ema_params)
            self._pp_params_stale = False

    def eval_params(self):
        """EMA params if present, else raw params (net_g_ema preference,
        ref: hat_model.py:30-37) — cast to the inference dtype (cached)."""
        self._sync_from_state()
        params = self.ema_params if self.ema_params is not None else self.params
        dt = self.inference_dtype()
        if dt is None:
            return params
        if self._apply_cache.get("_cast_src") is not params:
            from super_resolution_tpu.utils.precision import cast_floating

            self._apply_cache["_cast"] = cast_floating(params, dt)
            self._apply_cache["_cast_src"] = params
        return self._apply_cache["_cast"]

    def inference_dtype(self):
        """Optional reduced-precision inference (framework extension; the
        reference is fp32-only — see utils/precision.py). YAML:
        ``val: {inference_dtype: bf16}`` or top-level ``inference_dtype``."""
        from super_resolution_tpu.utils.precision import resolve_dtype

        name = ((self.opt.get("val") or {}).get("inference_dtype")
                or self.opt.get("inference_dtype"))
        return resolve_dtype(name)

    def _with_tp_ctx(self, thunk):
        """Run thunk under the TP attention context when this runner
        trains tensor-parallel — jit TRACES inside the call, so the
        context reaches the route decisions without leaking into other
        models in the process (parallel/tp.py::tp_attention)."""
        mesh = getattr(self, "_tp_attn_mesh", None)
        if mesh is None:
            return thunk()
        from super_resolution_tpu.parallel.tp import tp_attention

        with tp_attention(mesh):
            return thunk()

    def _apply_fn(self) -> Callable:
        if "apply" not in self._apply_cache:
            net = self.net_g
            from super_resolution_tpu.utils.precision import wrap_apply

            fwd = wrap_apply(
                lambda params, x: self._with_tp_ctx(
                    lambda: net.apply({"params": params}, x)),
                self.inference_dtype())
            self._apply_cache["apply"] = jax.jit(fwd)
        return self._apply_cache["apply"]

    def feed_data(self, data: dict):
        self.lq = jnp.asarray(data["lq"])
        if "gt" in data:
            self.gt = jnp.asarray(data["gt"])

    def test(self):
        self.output = self._apply_fn()(self.eval_params(), self.lq)

    def test_selfensemble(self):
        """x8 flip/rot TTA averaged in SR space (ref: sr_model.py:132-178),
        expressed as one batched forward over the 8 geometric variants."""
        x = self.lq

        def tf(img, op):
            if op == "v":
                return img[:, :, ::-1, :]
            if op == "h":
                return img[:, ::-1, :, :]
            return jnp.transpose(img, (0, 2, 1, 3))

        variants = [x]
        for op in ("v", "h", "t"):
            variants.extend([tf(v, op) for v in variants])
        fwd = self._apply_fn()
        outs = [fwd(self.eval_params(), v) for v in variants]
        # invert ops in reverse application order
        for i in range(len(outs)):
            if i > 3:
                outs[i] = tf(outs[i], "t")
            if i % 4 > 1:
                outs[i] = tf(outs[i], "h")
            if (i % 4) % 2 == 1:
                outs[i] = tf(outs[i], "v")
        self.output = jnp.mean(jnp.stack(outs), axis=0)

    # -------------------------------------------------------------- training
    def setup_training(self, mesh=None):
        """Wire the functional training core (train_loop.py) to this runner.

        mesh: optional jax Mesh; the batch axis is sharded over 'data'
        (the DDP analog). Without a mesh everything runs single-device.
        """
        from super_resolution_tpu.runtime.train_loop import (
            build_optimizer, init_train_state, make_sr_train_step)

        train_opt = self.opt["train"]
        self.mesh = mesh
        self.tx, self.lr_schedule = build_optimizer(train_opt)
        self.ema_decay = train_opt.get("ema_decay", 0)
        step_fn = make_sr_train_step(self.net_g, self.tx, train_opt)
        use_tp = mesh is not None and int(mesh.shape.get("model", 1)) > 1
        use_pp = mesh is not None and int(mesh.shape.get("pipe", 1)) > 1
        self._pp_mode = use_pp
        if use_pp:
            # GPipe training (parallel/pipeline.py): the RHAG stack as
            # stages over 'pipe', microbatches streamed via ppermute,
            # backward = reverse-mode through the schedule. Params live in
            # the {'stages','rest'} layout; the inference path merges
            # lazily (_sync_from_state).
            # TP x PP composition (r5): stage-local Megatron TP inside each
            # pipe stage — stage params sharded (pipe, ..., model), GSPMD
            # partitions the per-tick math over 'model' (pipeline_apply
            # keeps non-pipe axes automatic) while ppermute rides the pipe
            # ring. The Pallas TP megakernel routes (tp_attention/tp_ffn)
            # stay off here — those shard_maps can't nest inside the manual
            # pipe region; the XLA path carries the TP collectives.
            from super_resolution_tpu.parallel.pipeline import (
                init_pp_params, make_hat_pp_train_step)

            pp_params = init_pp_params(
                self.net_g, self.params, mesh,
                tp_axis="model" if use_tp else None)
            from super_resolution_tpu.parallel.tp import match_param_layout

            self.state = jax.jit(lambda p: init_train_state(
                p, self.tx, self.ema_decay))(pp_params)
            # same replicated-fresh-zeros issue as TP: pin the moments to
            # the pipe-stacked param layout
            self.state = self.state.replace(opt_state=match_param_layout(
                self.state.opt_state, pp_params))
            # donate the TrainState: params/moments/EMA update in place —
            # one resident copy of the optimizer tree instead of two
            # (optimize_parameters reassigns self.state from the output,
            # so the donated input is never read again)
            self._train_step = jax.jit(
                make_hat_pp_train_step(self.net_g, self.tx, train_opt, mesh),
                donate_argnums=0)
            self._pp_params_stale = True
        elif use_tp:
            # Megatron TP (parallel/tp.py): transformer matmuls sharded
            # over 'model', GSPMD inserts the collectives. The fused MSA
            # megakernels compose via HEAD parallelism (shard_map slices
            # the replicated attn weights per device —
            # parallel/tp_attention.py) and the fused MLP tails via
            # HIDDEN parallelism (parallel/tp_ffn.py); remaining fused
            # routes yield to XLA while tp_attention() is active
            # (trace-time contextvar, no process-global env mutation).
            from super_resolution_tpu.ops.attention import \
                _pallas_attention_enabled
            from super_resolution_tpu.parallel.tp import shard_params_tp

            self._tp_attn_mesh = mesh
            ntp = int(mesh.shape["model"])
            head_par = False
            if _pallas_attention_enabled():
                heads = self.opt["network_g"].get("num_heads") or ()
                head_par = bool(heads) and all(
                    int(h) % ntp == 0 for h in np.atleast_1d(heads))
            self._tp_head_par = head_par
            # fused-FFN composition: hidden dim sharded inside a shard_map
            # (parallel/tp_ffn.py) — the fc1/fc2 weights stay replicated
            from super_resolution_tpu.ops.pallas_ffn import ffn_fused_enabled
            from super_resolution_tpu.parallel.tp import mlp_hidden_divisible

            hid_par = (ffn_fused_enabled(ignore_tp=True)
                       and mlp_hidden_divisible(self.params, ntp))
            self._tp_hid_par = hid_par
            self.params = shard_params_tp(self.params, mesh,
                                          head_parallel_attn=head_par,
                                          hidden_parallel_mlp=hid_par)
            # under jit the EMA copy inherits the param layout, but the
            # optimizer moments are fresh zeros with no propagation source
            # and come out replicated — pin them to the param shardings
            from super_resolution_tpu.parallel.tp import match_param_layout

            self.state = jax.jit(lambda p: init_train_state(
                p, self.tx, self.ema_decay))(self.params)
            self.state = self.state.replace(opt_state=match_param_layout(
                self.state.opt_state, self.params))
            # computation follows the sharded operands (params in the TP
            # layout, batch on 'data'); explicit replicated out_shardings
            # would undo the layout every step. State donated: the updated
            # params/moments reuse the sharded input buffers in place.
            self._train_step = jax.jit(step_fn, donate_argnums=0)
        else:
            self.state = init_train_state(self.params, self.tx,
                                          self.ema_decay)
            if mesh is not None:
                from super_resolution_tpu.parallel.mesh import (
                    batch_sharding, replicated)

                self._train_step = jax.jit(
                    step_fn,
                    in_shardings=(replicated(mesh),
                                  {"lq": batch_sharding(mesh),
                                   "gt": batch_sharding(mesh)},
                                  replicated(mesh)),
                    out_shardings=(replicated(mesh), replicated(mesh)),
                    donate_argnums=0)
            else:
                # donate the TrainState (params + Adam moments + EMA update
                # in place): halves the train-state residency; the caller
                # replaces self.state with the step output every iteration
                self._train_step = jax.jit(step_fn, donate_argnums=0)
        self._train_rng = jax.random.PRNGKey(
            (self.opt.get("manual_seed") or 0) + 1)
        self.log_dict = {}

    def optimize_parameters(self, batch: dict, current_iter: int):
        self._train_rng, rng = jax.random.split(self._train_rng)
        data = {"lq": jnp.asarray(batch["lq"]), "gt": jnp.asarray(batch["gt"])}
        if self.mesh is not None and getattr(self, "_pp_mode", False):
            # GPipe consumes the whole batch on every pipe device
            # (microbatches stream through the ring, not across 'data')
            from super_resolution_tpu.parallel.mesh import replicate

            data = replicate(data, self.mesh)
        elif self.mesh is not None:
            from super_resolution_tpu.parallel.mesh import shard_batch

            n = data["lq"].shape[0] * jax.process_count()
            data_axis = int(self.mesh.shape.get("data", 1))
            if n % data_axis:
                raise ValueError(
                    f"global batch {n} does not divide the mesh 'data' axis "
                    f"({data_axis} devices); set batch_size_per_gpu so that "
                    f"batch_size_per_gpu x devices is loaded per step "
                    f"(build_dataloader does this when given the mesh)")
            data = shard_batch(data, self.mesh)
        self.state, logs = self._with_tp_ctx(
            lambda: self._train_step(self.state, data, rng))
        # publish the trained params to the inference path (PP merges
        # lazily — every-step merging would materialize a replicated copy)
        if getattr(self, "_pp_mode", False):
            self._pp_params_stale = True
        else:
            self.params = self.state.params
            if self.ema_decay > 0:
                self.ema_params = self.state.ema_params
        self.log_dict = logs  # device arrays; get_current_log syncs

    def current_lrs(self, current_iter: int):
        return [float(self.lr_schedule(current_iter))]

    def save(self, epoch: int, current_iter: int):
        """Checkpoint weights + trainer state (orbax; the reference's
        net_g_{iter}.pth + {iter}.state pair becomes one directory)."""
        from super_resolution_tpu.runtime.checkpoint import save_params

        import numpy as np

        self._sync_from_state()
        tree = {"params": jax.tree.map(np.asarray, self.params),
                "epoch": epoch, "iter": current_iter}
        ema = self.ema_params
        if (ema is None and not getattr(self, "_pp_mode", False)
                and getattr(self, "state", None) is not None
                and getattr(self, "ema_decay", 0) > 0):
            # a save before the first optimize_parameters (the per-step
            # sync hasn't run yet): the EMA tree lives in the train state
            ema = self.state.ema_params
        if ema is not None:
            tree["params_ema"] = jax.tree.map(np.asarray, ema)
        if getattr(self, "state", None) is not None:
            tree["opt_state"] = jax.tree.map(
                np.asarray, jax.tree.leaves(self.state.opt_state))
        path = osp.join(self.opt["path"]["models"], f"net_g_{current_iter}")
        save_params(path, tree)

    def resume_training(self, resume_path: str):
        from super_resolution_tpu.runtime.checkpoint import load_tree

        tree = load_tree(resume_path)
        self.params = jax.tree.map(jnp.asarray, tree["params"])
        # re-apply the TP layout: loaded arrays are plain/replicated, and
        # feeding them to the unconstrained train-step jit would silently
        # replicate the whole resumed run (computation follows data)
        mesh = getattr(self, "mesh", None)
        use_tp = mesh is not None and int(mesh.shape.get("model", 1)) > 1
        use_pp = getattr(self, "_pp_mode", False)
        if use_tp:
            from super_resolution_tpu.parallel.tp import shard_params_tp

            head_par = getattr(self, "_tp_head_par", False)
            hid_par = getattr(self, "_tp_hid_par", False)
            self.params = shard_params_tp(self.params, mesh,
                                          head_parallel_attn=head_par,
                                          hidden_parallel_mlp=hid_par)
        if "params_ema" in tree:
            self.ema_params = jax.tree.map(jnp.asarray, tree["params_ema"])
            if use_tp:
                self.ema_params = shard_params_tp(
                    self.ema_params, mesh, head_parallel_attn=head_par,
                    hidden_parallel_mlp=hid_par)
        if getattr(self, "state", None) is not None:
            from super_resolution_tpu.runtime.train_loop import TrainState

            opt_state = self.state.opt_state
            if "opt_state" in tree:
                # setup_training built self.state under the mesh, so its
                # leaves carry the target layout (TP-sharded / PP-stacked
                # moments); device_put the loaded arrays straight onto it
                old_leaves = jax.tree.leaves(self.state.opt_state)
                leaves = [
                    jax.device_put(np.asarray(v), old.sharding)
                    if (use_tp or use_pp) and hasattr(old, "sharding")
                    else jnp.asarray(v)
                    for v, old in zip(tree["opt_state"], old_leaves)]
                opt_state = jax.tree.unflatten(
                    jax.tree.structure(self.state.opt_state), leaves)
            state_params = self.params
            ema = self.ema_params if self.ema_decay > 0 else None
            if use_pp:
                # checkpoints hold the plain flax tree; train state wants
                # the {'stages','rest'} layout sharded over 'pipe'
                from super_resolution_tpu.parallel.pipeline import \
                    init_pp_params

                tp_ax = "model" if use_tp else None
                state_params = init_pp_params(self.net_g, self.params, mesh,
                                              tp_axis=tp_ax)
                if ema is not None:
                    ema = init_pp_params(self.net_g, ema, mesh,
                                         tp_axis=tp_ax)
                self._pp_params_stale = False
            self.state = TrainState(
                step=jnp.asarray(tree["iter"], jnp.int32),
                params=state_params,
                ema_params=ema,
                opt_state=opt_state)
        return int(tree["epoch"]), int(tree["iter"])

    def get_current_log(self):
        # per-step logs stay on device (async); the reference's torch loop
        # likewise only materializes losses at print time. One device_get
        # here instead of a blocking float() per scalar per step — over the
        # axon tunnel each of those syncs costs ~ms.
        return {k: float(v) for k, v in jax.device_get(self.log_dict).items()}

    # ------------------------------------------------------------ validation
    def get_current_visuals(self) -> dict:
        out = {"lq": np.asarray(self.lq), "result": np.asarray(self.output)}
        if hasattr(self, "gt"):
            out["gt"] = np.asarray(self.gt)
        return out

    def validation(self, dataloader, current_iter, tb_logger=None,
                   save_img: bool = False):
        if jax.process_count() > 1:
            self.dist_validation(dataloader, current_iter, tb_logger, save_img)
        else:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img)

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Process-sharded validation: each host evaluates images
        [process_index::process_count], metric sums reduce globally. An
        improvement over the reference's rank-0-only dist validation
        (ref: sr_model.py:180-182; SURVEY.md §5.8)."""
        from super_resolution_tpu.parallel.mesh import all_sum_across_processes

        dataset = dataloader.dataset
        dataset_name = dataset.opt["name"]
        metrics_opt = self.opt.get("val", {}).get("metrics")
        if not metrics_opt:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img)
            return
        self._initialize_best_metric_results(dataset_name)
        rank, world = jax.process_index(), jax.process_count()
        sums = {m: 0.0 for m in metrics_opt}
        count = 0
        for idx in range(rank, len(dataset), world):
            val_data = dataset[idx]
            self.feed_data({k: (v[None] if hasattr(v, "ndim") else v)
                            for k, v in val_data.items()})
            self._run_inference()
            visuals = self.get_current_visuals()
            metric_data = {"img": tensor2img(visuals["result"])}
            if "gt" in visuals:
                metric_data["img2"] = tensor2img(visuals["gt"])
            for name, opt_ in metrics_opt.items():
                sums[name] += calculate_metric(metric_data, opt_)
            count += 1
        sums["__count"] = float(count)
        totals = all_sum_across_processes(sums)
        n = max(totals.pop("__count"), 1.0)
        self.metric_results = {m: v / n for m, v in totals.items()}
        if rank == 0:
            for metric, value in self.metric_results.items():
                self._update_best_metric_result(dataset_name, metric, value,
                                                current_iter)
            self._log_validation_metric_values(current_iter, dataset_name,
                                               tb_logger)

    def _initialize_best_metric_results(self, dataset_name: str):
        if dataset_name in self.best_metric_results:
            return
        record = {}
        for metric, content in self.opt["val"]["metrics"].items():
            better = content.get("better", "higher")
            init_val = float("-inf") if better == "higher" else float("inf")
            record[metric] = dict(better=better, val=init_val, iter=-1)
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(self, dataset_name, metric, val, current_iter):
        rec = self.best_metric_results[dataset_name][metric]
        if ((rec["better"] == "higher" and val >= rec["val"])
                or (rec["better"] == "lower" and val <= rec["val"])):
            rec["val"] = val
            rec["iter"] = current_iter

    def _run_inference(self):
        """Hook for subclasses (padding / tiling)."""
        self.test()

    def _validation_postprocess(self, val_data, dataset_name, current_iter,
                                save_img):
        """Shared per-image tail of the validation loops: tensor2img,
        optional PNG save, metric accumulation (ref: sr_model.py:184-249).
        Expects self.output / self.gt already set for this image."""
        img_name = osp.splitext(osp.basename(val_data["lq_path"][0]))[0]
        visuals = self.get_current_visuals()
        sr_img = tensor2img(visuals["result"])
        metric_data = {"img": sr_img}
        if "gt" in visuals:
            metric_data["img2"] = tensor2img(visuals["gt"])

        if save_img:
            if self.opt["is_train"]:
                save_path = osp.join(self.opt["path"]["visualization"],
                                     img_name,
                                     f"{img_name}_{current_iter}.png")
            else:
                suffix = self.opt["val"].get("suffix") or self.opt["name"]
                save_path = osp.join(self.opt["path"]["visualization"],
                                     dataset_name,
                                     f"{img_name}_{suffix}.png")
            imwrite(sr_img, save_path)

        if self.opt.get("val", {}).get("metrics") is not None:
            for name, opt_ in self.opt["val"]["metrics"].items():
                self.metric_results[name] += calculate_metric(metric_data,
                                                              opt_)

    def _finalize_validation(self, dataset_name, n_images, current_iter,
                             tb_logger):
        for metric in self.metric_results:
            self.metric_results[metric] /= n_images
            self._update_best_metric_result(dataset_name, metric,
                                            self.metric_results[metric],
                                            current_iter)
        self._log_validation_metric_values(current_iter, dataset_name,
                                           tb_logger)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        dataset_name = dataloader.dataset.opt["name"]
        with_metrics = self.opt.get("val", {}).get("metrics") is not None
        if with_metrics:
            self.metric_results = {m: 0 for m in self.opt["val"]["metrics"]}
            self._initialize_best_metric_results(dataset_name)

        idx = -1
        for idx, val_data in enumerate(dataloader):
            self.feed_data(val_data)
            self._run_inference()
            self._validation_postprocess(val_data, dataset_name, current_iter,
                                         save_img)

        if with_metrics and idx >= 0:
            self._finalize_validation(dataset_name, idx + 1, current_iter,
                                      tb_logger)

    def _log_validation_metric_values(self, current_iter, dataset_name, tb_logger):
        log_str = f"Validation {dataset_name}\n"
        for metric, value in self.metric_results.items():
            log_str += f"\t # {metric}: {value:.4f}"
            if dataset_name in self.best_metric_results:
                rec = self.best_metric_results[dataset_name][metric]
                log_str += (f"\tBest: {rec['val']:.4f} @ {rec['iter']} iter")
            log_str += "\n"
        self.logger.info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f"metrics/{dataset_name}/{metric}", value,
                                     current_iter)


@MODEL_REGISTRY.register()
class HATModel(SRModel):
    """HAT runner: window-multiple padding + optional on-device tiled
    inference (ref: hat/models/hat_model.py).

    pre/post_process are folded into a single jitted pipeline: reflect-pad
    to window multiple -> forward (whole image or batched tile grid) ->
    crop. Tile mode runs the whole grid on device (runtime/tile.py) instead
    of the reference's per-tile Python loop.
    """

    def window_size(self) -> int:
        return self.opt["network_g"].get("window_size", 16)

    def _run_inference(self):
        ws = self.window_size()
        _, h, w, _ = self.lq.shape
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        img = self.lq
        if pad_h or pad_w:
            img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                          mode="reflect")

        if "tile" in self.opt:
            tile_opt = self.opt["tile"]
            fwd = self._apply_fn()
            params = self.eval_params()
            mesh = None
            if tile_opt.get("multichip"):
                from super_resolution_tpu.parallel.mesh import make_mesh

                if "_tile_mesh" not in self._apply_cache:
                    self._apply_cache["_tile_mesh"] = make_mesh()
                mesh = self._apply_cache["_tile_mesh"]
            out = tile_forward(lambda t: fwd(params, t), img, self.scale,
                               tile_opt["tile_size"], tile_opt["tile_pad"],
                               chunk=tile_opt.get("chunk", 8), mesh=mesh)
        else:
            out = self._apply_fn()(self.eval_params(), img)
        self.output = out[:, :h * self.scale, :w * self.scale, :]

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        """Shape-bucketed cross-image batched validation when
        ``val: {bucketed_eval: true}`` and tile mode are set: the whole
        set runs through a handful of compiled programs with tiles
        batched across images (runtime/batched_eval.py — replaces the
        reference's eager per-image pre_process, hat_model.py:16-26).
        Results are bit-identical to the per-image tile path."""
        val_opt = self.opt.get("val") or {}
        tile_opt = self.opt.get("tile")
        if not (val_opt.get("bucketed_eval") and tile_opt):
            return super().nondist_validation(dataloader, current_iter,
                                              tb_logger, save_img)

        from super_resolution_tpu.runtime.batched_eval import \
            bucketed_tile_eval

        items = list(dataloader)
        ws = self.window_size()
        lqs, true_dims = [], []
        for val_data in items:
            lq = jnp.asarray(val_data["lq"])
            _, h, w, _ = lq.shape
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            if pad_h or pad_w:
                lq = jnp.pad(lq, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                             mode="reflect")
            lqs.append(lq)
            true_dims.append((h, w))

        mesh = None
        if tile_opt.get("multichip"):
            from super_resolution_tpu.parallel.mesh import make_mesh

            if "_tile_mesh" not in self._apply_cache:
                self._apply_cache["_tile_mesh"] = make_mesh()
            mesh = self._apply_cache["_tile_mesh"]
        outs = bucketed_tile_eval(
            self._apply_fn(), self.eval_params(), lqs, self.scale,
            tile_opt["tile_size"], tile_opt["tile_pad"],
            chunk=tile_opt.get("chunk", 8),
            quant=val_opt.get("bucket_quant", 32), mesh=mesh)

        dataset_name = dataloader.dataset.opt["name"]
        with_metrics = val_opt.get("metrics") is not None
        if with_metrics:
            self.metric_results = {m: 0 for m in val_opt["metrics"]}
            self._initialize_best_metric_results(dataset_name)
        for val_data, out, (h, w) in zip(items, outs, true_dims):
            self.feed_data(val_data)
            self.output = jnp.asarray(
                out[:, :h * self.scale, :w * self.scale, :])
            self._validation_postprocess(val_data, dataset_name, current_iter,
                                         save_img)
        if with_metrics and items:
            self._finalize_validation(dataset_name, len(items), current_iter,
                                      tb_logger)


@MODEL_REGISTRY.register()
class SwinIRModel(HATModel):
    """SwinIR runner — identical window-padded inference strategy
    (ref: basicsr/models/swinir_model.py pads like HATModel)."""


@MODEL_REGISTRY.register()
class SRGANModel(HATModel):
    """Paired GAN SR runner name (ref: basicsr/models/srgan_model.py). The
    G/D machinery lives in RealHATGANModel with degradation disabled."""

    def __new__(cls, opt):
        from super_resolution_tpu.runtime.realgan import RealHATGANModel

        opt = dict(opt)
        opt.setdefault("high_order_degradation", False)
        return RealHATGANModel(opt)


@MODEL_REGISTRY.register()
class ESRGANModel(SRGANModel):
    """ESRGAN runner name (ref: basicsr/models/esrgan_model.py)."""
