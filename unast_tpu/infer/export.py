"""Ahead-of-time serving export: serialize the warm serving programs to
StableHLO artifacts (jax.export) plus a weights file, so a deployment
host can load and run them WITHOUT the model-building Python code.

Deployment-stack ADDITION over the reference (whose inference entry
points re-instantiate the full torch model from source each time,
src/train.py:976-1024): the exported artifact pins the exact compiled
computation (versioned StableHLO with jax.export's compatibility
guarantees), the weights ride alongside as a plain pickled pytree, and
`load_bundle` rebuilds callable functions with nothing but jax
installed. Shapes are static per export (the serving layer already
works on fixed buckets), so one bundle holds one (batch, bucket) shape
per function — export the buckets you serve.

Usage:
    from unast_tpu.infer.export import export_bundle, load_bundle
    export_bundle(path, fns={"vocode": (fn, example_args)},
                  weights=params)
    b = load_bundle(path)
    wav = b.call("vocode", b.weights, mel)      # runs the AOT program

The serialized functions take the SAME positional arguments they were
exported with (weights first by convention here, so quantized/sharded
trees keep working — the artifact is weight-free and one weights file
can be swapped under a fixed program, e.g. after fine-tuning).
"""

import io
import os
import pickle
import zipfile

import jax
import numpy as np
from jax import export as jexport


def _specs_like(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        tree)


def export_bundle(path: str, fns: dict, weights=None, platforms=None):
    """Serialize `fns` ({name: (callable, example_args_tuple)}) and an
    optional weights pytree into one .zip bundle at `path`.

    Each callable is traced at the example args' shapes/dtypes via
    jax.export (StableHLO). `platforms` optionally lowers for several
    backends at once (e.g. ("tpu", "cpu")); default = current backend."""
    kw = {"platforms": platforms} if platforms else {}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        names = []
        for name, (fn, example_args) in fns.items():
            exp = jexport.export(jax.jit(fn), **kw)(
                *[_specs_like(a) for a in example_args])
            z.writestr(f"fn/{name}.shlo", exp.serialize())
            names.append(name)
        z.writestr("manifest.pkl", pickle.dumps(
            {"names": names, "jax_version": jax.__version__}))
        if weights is not None:
            w = jax.tree_util.tree_map(np.asarray, weights)
            buf = io.BytesIO()
            pickle.dump(w, buf, protocol=pickle.HIGHEST_PROTOCOL)
            z.writestr("weights.pkl", buf.getvalue())
    return path


class Bundle:
    """Loaded AOT serving bundle: `call(name, *args)` runs the exported
    program (under jit, so results stay on device between calls);
    `weights` is the deserialized pytree (None if not shipped)."""

    def __init__(self, exported: dict, weights, manifest: dict):
        self._exported = exported
        self.weights = weights
        self.manifest = manifest
        self._fns = {}

    def names(self):
        return sorted(self._exported)

    def call(self, name, *args):
        if name not in self._fns:
            exp = self._exported[name]
            self._fns[name] = jax.jit(exp.call)
        return self._fns[name](*args)


def load_bundle(path: str) -> Bundle:
    exported, weights, manifest = {}, None, {}
    with zipfile.ZipFile(path, "r") as z:
        manifest = pickle.loads(z.read("manifest.pkl"))
        for name in manifest["names"]:
            exported[name] = jexport.deserialize(z.read(f"fn/{name}.shlo"))
        if "weights.pkl" in z.namelist():
            weights = pickle.loads(z.read("weights.pkl"))
    return Bundle(exported, weights, manifest)


def export_synthesizer(syn, path: str, batch: int = 8,
                       mel_bucket: int = None, text_bucket: int = None,
                       platforms=None):
    """Export a Synthesizer's active one-pass serving programs at one
    (batch, bucket) shape: whichever of NAR text->mel ('nar_tts'),
    neural vocoding ('vocode'), and CTC ASR ('ctc_asr') the instance is
    configured for. Weights ship as {"nar": pv, "melgan": params,
    "ctc": pv} so load-side calls are
    b.call("vocode", b.weights["melgan"], mel) etc."""
    import jax.numpy as jnp

    from .. import nn
    cfg = syn.cfg
    mel_bucket = mel_bucket or syn.mel_buckets[-1]
    text_bucket = text_bucket or syn.text_buckets[-1]
    fns, weights = {}, {}
    if syn.nar_pv is not None:
        ids = jnp.zeros((batch, text_bucket), jnp.int32)
        lens = jnp.ones((batch,), jnp.int32)

        def nar_tts(pv, ids, lens):
            from ..models import fastspeech as FS
            p, s = pv
            (_, post, out_lens, _), _ = FS.fastspeech_forward(
                p, s, nn.Ctx.eval(), cfg, ids, lens,
                max_len=cfg.max_mel_len)
            return post, out_lens

        fns["nar_tts"] = (nar_tts, (syn.nar_pv, ids, lens))
        weights["nar"] = syn.nar_pv
    if syn.melgan_params is not None:
        from ..models import melgan as MG
        mel = jnp.zeros((batch, mel_bucket, cfg.num_mels), jnp.float32)
        fns["vocode"] = (lambda p, m: MG.generator_forward(p, m),
                         (syn.melgan_params, mel))
        weights["melgan"] = syn.melgan_params
    if syn.ctc_pv is not None:
        from ..models import ctc as CT
        mel = jnp.zeros((batch, mel_bucket, cfg.num_mels), jnp.float32)
        mlens = jnp.ones((batch,), jnp.int32)

        def ctc_asr(pv, mel, mel_len):
            p, s = pv
            (ids, lens), _ = CT.ctc_asr_infer(p, s, nn.Ctx.eval(), cfg,
                                              mel, mel_len)
            return ids, lens

        fns["ctc_asr"] = (ctc_asr, (syn.ctc_pv, mel, mlens))
        weights["ctc"] = syn.ctc_pv
    if not fns:
        raise ValueError("Synthesizer has no one-pass serving programs to "
                         "export (need nar_pv / melgan_params / ctc_pv)")
    return export_bundle(path, fns, weights=weights, platforms=platforms)
