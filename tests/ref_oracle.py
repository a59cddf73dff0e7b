"""Load the reference implementation (/root/reference/src) as a torch golden
oracle for objective-level parity tests (VERDICT r1 item 4).

The image lacks librosa / jiwer / eng_to_ipa / unidecode / inflect; they are
stubbed at import time — none of their functionality is on the objective
code path under test (they serve wav DSP, WER, and G2P, which the parity
tests never call).

Also provides `copy_transformer_weights`: copies every parameter of a
reference transformer-variant UNAST (torch) into our functional param/state
trees, reusing the layer copiers from tests/test_models.py.
"""

import os
import sys
import types

import numpy as np

REF_SRC = "/root/reference/src"


def available() -> bool:
    return os.path.isdir(REF_SRC)


def _stub_module(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _InflectEngine:
    def __getattr__(self, name):  # no number normalization in these tests
        raise RuntimeError(f"inflect stub: {name} not available")


_REF_CACHE = {}


def load_reference():
    """Import the reference's train/network/module/utils modules.
    Returns a namespace with .train, .network, .module, .utils."""
    if _REF_CACHE:
        return _REF_CACHE["ns"]
    import torch

    _stub_module("librosa")
    _stub_module("librosa.filters")
    _stub_module("jiwer", wer=None)
    _stub_module("eng_to_ipa", convert=lambda s: s)
    _stub_module("unidecode", unidecode=lambda s: s)
    _stub_module("inflect", engine=lambda: _InflectEngine())
    import matplotlib
    matplotlib.use("Agg")

    sys.path.insert(0, REF_SRC)
    try:
        import utils as r_utils
        import module as r_module
        import network as r_network
        import train as r_train
    finally:
        sys.path.remove(REF_SRC)

    r_train.DEVICE = torch.device("cpu")
    r_utils.DEVICE = torch.device("cpu")
    ns = types.SimpleNamespace(train=r_train, network=r_network,
                               module=r_module, utils=r_utils)
    _REF_CACHE["ns"] = ns
    return ns


def patch_deterministic(ns):
    """Disable the stochastic pieces of the objective code so eval-mode
    forward passes are deterministic: DAE noising (utils.noise_fn, imported
    into network.py's namespace) and SpecAugment (train.py namespace)."""
    ns.network.noise_fn = lambda x, *a, **k: x
    ns.train.specaugment = lambda mel, mel_len, *a, **k: mel


# ---------------------------------------------------------------------------
# Weight copier: reference torch UNAST (transformer) -> our param/state trees
# ---------------------------------------------------------------------------


def _t2j(t):
    import jax.numpy as jnp
    return jnp.asarray(t.detach().numpy())


def _lin(mod):
    """torch nn.Linear (or reference Linear wrapper) -> {'w','b'}."""
    if hasattr(mod, "linear_layer"):
        mod = mod.linear_layer
    p = {"w": _t2j(mod.weight.T)}
    if mod.bias is not None:
        p["b"] = _t2j(mod.bias)
    return p


def _conv(mod):
    """reference Conv wrapper ([out,in,k]) -> {'w' [k,in,out], 'b'}."""
    c = mod.conv if hasattr(mod, "conv") else mod
    p = {"w": _t2j(c.weight.permute(2, 1, 0))}
    if c.bias is not None:
        p["b"] = _t2j(c.bias)
    return p


def _bn(mod):
    return ({"scale": _t2j(mod.weight), "bias": _t2j(mod.bias)},
            {"mean": _t2j(mod.running_mean), "var": _t2j(mod.running_var)})


def _lstm_layers(rnn):
    """torch nn.LSTM -> [{'fwd': cell, ('bwd': cell)}] per layer."""
    layers = []
    for li in range(rnn.num_layers):
        layer = {}
        dirs = (("fwd", ""), ("bwd", "_reverse")) if rnn.bidirectional \
            else (("fwd", ""),)
        for dirname, suffix in dirs:
            layer[dirname] = {
                "wi": _t2j(getattr(rnn, f"weight_ih_l{li}{suffix}").T),
                "wh": _t2j(getattr(rnn, f"weight_hh_l{li}{suffix}").T),
                "bi": _t2j(getattr(rnn, f"bias_ih_l{li}{suffix}")),
                "bh": _t2j(getattr(rnn, f"bias_hh_l{li}{suffix}")),
            }
        layers.append(layer)
    return layers


def copy_transformer_weights(model, cfg):
    """Reference UNAST (transformer text_m/speech_m + LSTMDiscriminator) ->
    (params, state) for unast_tpu.models.unast with the same cfg."""
    from test_models import _copy_encoder_layer, _copy_decoder_layer

    d = cfg.e_in
    text_prenet, bn_s = _copy_text_prenet(model.text_m.prenet)

    def _tr_stack(torch_wrap, which):
        inner = (torch_wrap.transformer_encoder if which == "enc"
                 else torch_wrap.transformer_decoder)
        copier = _copy_encoder_layer if which == "enc" else _copy_decoder_layer
        return {"layers": [copier(l, d) for l in inner.layers]}

    text_p = {
        "prenet": text_prenet,
        "encoder": _tr_stack(model.text_m.encoder, "enc"),
        "decoder": _tr_stack(model.text_m.decoder, "dec"),
        "postnet": {"fc": _lin(model.text_m.postnet.fc1)},
    }
    text_s = {"prenet": bn_s}

    sp = model.speech_m.prenet.layer
    post_p, pbn_s = _copy_speech_postnet(model.speech_m.postnet)
    speech_p = {
        "prenet": {"fc1": _lin(sp.fc1), "fc2": _lin(sp.fc2)},
        "encoder": _tr_stack(model.speech_m.encoder, "enc"),
        "decoder": _tr_stack(model.speech_m.decoder, "dec"),
        "postnet": post_p,
    }
    speech_s = {"postnet": pbn_s}

    params = {"text_m": text_p, "speech_m": speech_p}
    state = {"text_m": text_s, "speech_m": speech_s}

    if model.discriminator is not None:
        params["discriminator"] = _copy_lstm_discriminator(model.discriminator)
    return params, state


def _copy_lstm_discriminator(disc):
    rnn_p = {"layers": _lstm_layers(disc.rnn.rnn)}
    if disc.rnn.num_dir == 2:
        rnn_p["reduce_h"] = _lin(disc.rnn.reduce_h_W)
        rnn_p["reduce_c"] = _lin(disc.rnn.reduce_c_W)
    return {"rnn": rnn_p, "fc2": _lin(disc.fc2)}


def _copy_rnn_encoder(enc):
    p = {"layers": _lstm_layers(enc.rnn)}
    if enc.num_dir == 2:
        p["reduce_h"] = _lin(enc.reduce_h_W)
        p["reduce_c"] = _lin(enc.reduce_c_W)
    return p


def copy_rnn_decoder(dec):
    """Reference RNNDecoder (src/module.py:340-374) -> our rnn_decoder_init
    tree (cells + attn + proj)."""
    p = {"cells": [layer["fwd"] for layer in _lstm_layers(dec.rnn)]}
    if dec.attention == "lsa":
        att = dec.attention_layer
        p["attn"] = {
            "query": _lin(att.query_layer),
            "memory": _lin(att.memory_layer),
            "v": _lin(att.v),
            "loc_conv": _conv(att.location_layer.location_conv),
            "loc_dense": _lin(att.location_layer.location_dense),
        }
    elif dec.attention == "luong":
        att = dec.attention_layer
        p["attn"] = {
            "proj_hid": _lin(att.project_hid),
            "proj_eo": _lin(att.project_eo),
            "fc2": _lin(att.fc2),
        }
    if dec.attention:
        p["proj"] = _lin(dec.linear_projection)
    return p


def _copy_text_prenet(tp):
    prenet = {
        "embed": {"w": _t2j(tp.embed.weight)},
        "conv1": _conv(tp.conv1), "conv2": _conv(tp.conv2),
        "conv3": _conv(tp.conv3),
    }
    bn_p, bn_s = {}, {}
    for i, mod in ((1, tp.batch_norm1), (2, tp.batch_norm2),
                   (3, tp.batch_norm3)):
        bn_p[f"bn{i}"], bn_s[f"bn{i}"] = _bn(mod)
    prenet["bn"] = bn_p
    return prenet, {"bn": bn_s}


def _copy_speech_postnet(pn):
    post_p = {
        "conv1": _conv(pn.conv1),
        "convs": [_conv(c) for c in pn.conv_list],
        "conv2": _conv(pn.conv2),
        "mel_proj": _lin(pn.linear_project),
        "stop_proj": _lin(pn.stop_linear),
    }
    pbn_p, pbn_s = {}, {}
    pbn_p["bn0"], pbn_s["bn0"] = _bn(pn.pre_batchnorm)
    for i, mod in enumerate(pn.batch_norm_list):
        pbn_p[f"bn{i + 1}"], pbn_s[f"bn{i + 1}"] = _bn(mod)
    post_p["bn"] = pbn_p
    return post_p, {"bn": pbn_s}


def copy_rnn_weights(model, cfg):
    """Reference UNAST (RNN text_m/speech_m + LSTMDiscriminator) ->
    (params, state) for unast_tpu.models.unast with the same cfg."""
    text_prenet, text_bn_s = _copy_text_prenet(model.text_m.prenet)
    text_p = {
        "prenet": text_prenet,
        "encoder": _copy_rnn_encoder(model.text_m.encoder),
        "decoder": copy_rnn_decoder(model.text_m.decoder),
        "postnet": {"fc": _lin(model.text_m.postnet.fc1)},
    }
    sp = model.speech_m.prenet.layer
    post_p, post_s = _copy_speech_postnet(model.speech_m.postnet)
    speech_p = {
        "prenet": {"fc1": _lin(sp.fc1), "fc2": _lin(sp.fc2)},
        "encoder": _copy_rnn_encoder(model.speech_m.encoder),
        "decoder": copy_rnn_decoder(model.speech_m.decoder),
        "postnet": post_p,
    }
    params = {"text_m": text_p, "speech_m": speech_p}
    state = {"text_m": {"prenet": text_bn_s}, "speech_m": {"postnet": post_s}}
    if model.discriminator is not None:
        params["discriminator"] = _copy_lstm_discriminator(model.discriminator)
    return params, state
