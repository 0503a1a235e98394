"""Batched INT8 inference serving.

No reference equivalent (the reference is a research training script); this
is the deployment half of the BASELINE.json north star ("weight-sharded
batched inference"). Design:

- requests accumulate into fixed-size batches (static shapes keep one
  compiled executable; remainder requests are padded and the padding
  dropped on the way out);
- the executor thread owns the device stream, overlapping host batching
  with device compute;
- the model is the frozen INT8 graph (kernels/infer.py) — weights int8 in
  HBM, activations quantized on-chip;
- optional TP: pass a mesh and the int8 kernels are sharded on output
  channels (dist/sharding.py) with XLA inserting the collectives.

Environment note: through this build's remote-TPU tunnel, end-to-end
serving is H2D-transfer-bound (~6 MB/s over the relay — measured 495 img/s
vs millions device-side); on a real TPU host inputs arrive over local DMA
and the engine's batching/dispatch overheads are the relevant costs.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BatchedInferenceEngine:
    """Fixed-batch async inference with padding.

    engine = BatchedInferenceEngine(fwd, qparams, batch_size=256,
                                    input_shape=(32, 32, 3))
    fut = engine.submit(images)        # (n, 32, 32, 3), n <= batch_size
    logits = fut.result()
    """

    def __init__(
        self,
        forward: Callable,
        params: Any,
        batch_size: int,
        input_shape: Tuple[int, ...],
        max_delay_ms: float = 2.0,
        mesh: Optional[Any] = None,
        data_axis: str = "data",
        model_axis: str = "model",
    ):
        """mesh: optional jax.sharding.Mesh for sharded serving — int8 conv
        kernels shard on output channels over `model_axis`
        (dist/sharding.py qparams_shardings) and request batches over
        `data_axis`; batch_size must divide by the data-axis size."""
        self.forward = jax.jit(forward)
        self.mesh = mesh
        self._place_x = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from alignq_tpu.dist.sharding import place_qparams

            if batch_size % mesh.shape[data_axis]:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by data axis "
                    f"size {mesh.shape[data_axis]}"
                )
            params = place_qparams(params, mesh, model_axis)
            x_sh = NamedSharding(mesh, P(data_axis))
            self._place_x = lambda x: jax.device_put(x, x_sh)
        self.params = params
        self.batch_size = batch_size
        self.input_shape = tuple(input_shape)
        self.max_delay = max_delay_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        # warm the executable once so first requests don't pay compile
        dummy = jnp.zeros((batch_size, *self.input_shape), jnp.float32)
        if self._place_x is not None:
            dummy = self._place_x(dummy)
        jax.block_until_ready(self.forward(self.params, dummy))
        self._thread.start()

    def submit(self, images: np.ndarray) -> "Future":
        assert images.shape[1:] == self.input_shape, images.shape
        assert images.shape[0] <= self.batch_size
        fut = Future()
        self._q.put((images, fut))
        return fut

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch: List[Tuple[np.ndarray, "Future"]] = [first]
            count = first[0].shape[0]
            deadline = self.max_delay
            import time

            t0 = time.perf_counter()
            while count < self.batch_size:
                remaining = deadline - (time.perf_counter() - t0)
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if count + nxt[0].shape[0] > self.batch_size:
                    # put back; it starts the next batch
                    self._q.put(nxt)
                    break
                batch.append(nxt)
                count += nxt[0].shape[0]

            x = np.concatenate([b[0] for b in batch], axis=0)
            pad = self.batch_size - x.shape[0]
            if pad:
                x = np.concatenate(
                    [x, np.zeros((pad, *self.input_shape), x.dtype)], axis=0
                )
            try:
                xj = jnp.asarray(x)
                if self._place_x is not None:
                    xj = self._place_x(xj)
                out = np.asarray(self.forward(self.params, xj))
            except Exception as e:  # propagate instead of hanging futures
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            off = 0
            for images, fut in batch:
                n = images.shape[0]
                fut.set_result(out[off : off + n])
                off += n

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)


class Future:
    def __init__(self):
        self._ev = threading.Event()
        self._val: Optional[np.ndarray] = None
        self._exc: Optional[BaseException] = None

    def set_result(self, val):
        self._val = val
        self._ev.set()

    def set_exception(self, exc: BaseException):
        self._exc = exc
        self._ev.set()

    def result(self, timeout: float = 60.0) -> np.ndarray:
        if not self._ev.wait(timeout):
            raise TimeoutError("inference result not ready")
        if self._exc is not None:
            raise self._exc
        return self._val


def build_int8_resnet20_engine(
    params: Any, batch_stats: Any, batch_size: int = 256, mesh: Any = None,
    act_impl: str = "erf", stream: str = "int16",
) -> BatchedInferenceEngine:
    """Freeze trained params into the INT8 graph and wrap in an engine.

    mesh: optional Mesh with ('data', 'model') axes for DP+TP serving.
    act_impl/stream select the deploy-graph fast paths (kernels/infer.py) —
    pair them with the QAT options that trained the model ('poly' with
    cdf_impl='poly'; 'int8' with stream_int8=True)."""
    import functools

    from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward

    qparams = convert_resnet20(params, batch_stats)
    fwd = functools.partial(
        resnet20_int8_forward, act_impl=act_impl, stream=stream
    )
    return BatchedInferenceEngine(fwd, qparams, batch_size, (32, 32, 3), mesh=mesh)


def engine_from_artifact(
    path: str, batch_size: int = 256, mesh: Any = None
) -> BatchedInferenceEngine:
    """Serve a frozen INT artifact (tools/export_int8.py --save,
    tools/export_da_int8.py --save).

    The artifact's meta records which family and deploy graph its weights
    were trained for; the deploy registry
    (kernels/deploy_registry.py, VERDICT r4 item 4) turns that into a
    structure-matching template pytree + the family's INT forward, so
    every exported family — CIFAR nets (incl. DenseNet stage-int8 and
    int4-packed PreAct ResNets), ImageNet ResNets, and the DA heads —
    serves through the same engine."""
    import functools

    import numpy as np

    from alignq_tpu.kernels.artifact import load_int8_artifact
    from alignq_tpu.kernels.deploy_registry import DEPLOY_FAMILIES

    # peek meta for the family / packing before building the template
    raw = np.load(path)
    meta0 = {
        k.split("/", 1)[1]: raw[k]
        for k in raw.files
        if k.startswith("__meta__/")
    }
    model_name = str(np.asarray(meta0.get("model", "resnet20")))
    packed = bool(int(np.asarray(meta0.get("packed_int4", 0))))
    if model_name not in DEPLOY_FAMILIES:
        raise ValueError(
            f"artifact model {model_name!r} not in the deploy registry; "
            f"have {sorted(DEPLOY_FAMILIES)}"
        )
    family = DEPLOY_FAMILIES[model_name]
    template = family.template(meta0)
    base_fwd = family.forward(meta0)
    if packed:
        # int4-packed artifact (tools/export_int8.py --pack_int4): the
        # template must mirror the saved structure; weights stay packed in
        # HBM and the nibble expansion runs in-graph ahead of each conv
        if not family.supports_packed_int4:
            raise ValueError(f"{model_name!r} has no int4-packed deploy path")
        from alignq_tpu.kernels.convert import packed_int4_forward, pack_qparams_int4

        template = pack_qparams_int4(template)
        fwd_for_pack = base_fwd.func if isinstance(
            base_fwd, functools.partial
        ) else base_fwd
        pack_kw = base_fwd.keywords if isinstance(
            base_fwd, functools.partial
        ) else {}
        base_fwd = functools.partial(packed_int4_forward, fwd_for_pack, **pack_kw)
    qparams, _meta = load_int8_artifact(path, template)
    if str(np.asarray(meta0.get("act_impl", ""))) == "bins_int":
        # cutpoints derive from the loaded scale/bias — re-derived here so
        # the on-disk schema stays family-uniform (export saves unaugmented)
        if packed:
            raise ValueError("bins_int + packed_int4 serving not supported")
        from alignq_tpu.kernels.infer import augment_int_cutpoints

        qparams = augment_int_cutpoints(
            qparams, int(np.asarray(meta0.get("act_bits", 4)))
        )
    return BatchedInferenceEngine(
        base_fwd, qparams, batch_size, family.input_shape(meta0), mesh=mesh
    )
