"""JSON-schema generation for experiment configs from code signatures.

Counterpart of the reference's cat/utils/parseschema.py (405 LoC), which
generates `.vscode/sgm_{hyper,nn}.json` editor-intellisense schemas by
reflecting over python signatures. Here the schemas are derived from the
actual registries the framework resolves `type` fields against:

  config.json  — encoder/decoder/joiner zoo (flax dataclass fields),
                 scheduler registry, optimizer table, trainer/specaug
  hyper-p.json — the pipeline's documented key set

CLI:  python -m cat_tpu.utils.schema [out_dir]      (default .vscode/)
"""
from __future__ import annotations

import dataclasses
import inspect
import json
import os
import typing


_PY2JSON = {
    int: "integer", float: "number", str: "string", bool: "boolean",
    list: "array", tuple: "array", dict: "object",
}


def _type_to_schema(tp):
    """Best-effort python annotation → JSON-schema fragment."""
    if tp in _PY2JSON:
        return {"type": _PY2JSON[tp]}
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return _type_to_schema(args[0])
        return {}
    if origin in (list, tuple):
        return {"type": "array"}
    if origin is dict:
        return {"type": "object"}
    return {}


def _kwargs_schema_from_fields(cls):
    """Flax linen modules are dataclasses — read fields + defaults."""
    props = {}
    required = []
    try:
        fields = dataclasses.fields(cls)
    except TypeError:
        return _kwargs_schema_from_signature(cls)
    for f in fields:
        if f.name in ("parent", "name", "num_classes"):
            continue  # framework-injected
        sub = _type_to_schema(f.type) if not isinstance(f.type, str) \
            else {}
        if f.default is not dataclasses.MISSING:
            try:
                json.dumps(f.default)
                sub = dict(sub, default=f.default)
            except TypeError:
                pass
        elif f.default_factory is dataclasses.MISSING:  # type: ignore
            required.append(f.name)
        props[f.name] = sub
    out = {"type": "object", "properties": props,
           "additionalProperties": False}
    if required:
        out["required"] = required
    return out


def _kwargs_schema_from_signature(fn, skip=("self", "lr_init")):
    props = {}
    required = []
    for name, p in inspect.signature(fn).parameters.items():
        if name in skip or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        sub = {}
        if p.annotation is not inspect.Parameter.empty and \
                not isinstance(p.annotation, str):
            sub = _type_to_schema(p.annotation)
        if p.default is not inspect.Parameter.empty:
            try:
                json.dumps(p.default)
                sub = dict(sub, default=p.default)
            except TypeError:
                pass
        else:
            required.append(name)
        props[name] = sub
    out = {"type": "object", "properties": props,
           "additionalProperties": False}
    if required:
        out["required"] = required
    return out


def _zoo_variants(names, get, kwargs_of):
    """oneOf over {"type": <name>, "kwargs": <per-class schema>}."""
    variants = []
    for n in sorted(names):
        try:
            cls = get(n)
        except AttributeError:
            continue
        variants.append({
            "type": "object",
            "properties": {
                "type": {"const": n,
                         "description": (inspect.getdoc(cls) or
                                         "").split("\n")[0]},
                "kwargs": kwargs_of(cls),
            },
            "required": ["type"],
        })
    return {"oneOf": variants}


_ENCODERS = ["LSTM", "VGGLSTM", "LSTMrowCONV", "TDNN_NAS", "TDNN_LSTM",
             "BLSTMN", "ConformerNet", "ConformerLSTM",
             "JoinAPLinearEncoder", "JoinAPNonLinearEncoder",
             "EmbeddingEncoder"]
_DECODERS = ["LSTMPredictor", "Embedding", "CausalTransformer",
             "TransformerDecoder", "ZeroDecoder"]
_JOINERS = ["JointNet", "HAT", "LogAdd"]
_OPTIMIZERS = ["Adam", "AdamW", "SGD", "Adadelta", "Adagrad", "RMSprop",
               "Lamb"]


def nn_config_schema():
    """Schema for config.json (the reference's sgm_nn.json)."""
    from cat_tpu import models
    from cat_tpu.utils import scheduler as sched_mod

    scheduler_schema = {
        "type": "object",
        "properties": {
            "type": {"enum": sorted(sched_mod._REGISTRY)},
            "kwargs": {"type": "object"},
            "optimizer": {
                "type": "object",
                "properties": {
                    "type": {"enum": _OPTIMIZERS},
                    "kwargs": {"type": "object"},
                    "grad_clip": {"type": "number"},
                },
                "required": ["type"],
            },
        },
        "required": ["type", "optimizer"],
    }
    # per-scheduler kwargs as anyOf (documentational; kwargs keys differ)
    scheduler_schema["anyOf"] = [
        {"properties": {
            "type": {"const": n},
            "kwargs": _kwargs_schema_from_signature(c.__init__)}}
        for n, c in sorted(sched_mod._REGISTRY.items())
    ]
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "cat_tpu nn config (config.json)",
        "type": "object",
        "properties": {
            "trainer": {"type": "object",
                        "properties": {
                            "loss": {"enum": ["ctc", "crf", "rnnt",
                                              "rnnt_simple", "ctct"]},
                            "lamb": {"type": "number", "default": 0.1},
                            "den_lm": {"type": "string"},
                        }},
            "specaug": {"type": "object",
                        "properties": {
                            "num_freq_masks": {"type": "integer"},
                            "freq_mask_width": {"type": "integer"},
                            "num_time_masks": {"type": "integer"},
                            "time_mask_width": {"type": "integer"},
                            "time_warp": {"type": "integer"},
                        }},
            "encoder": _zoo_variants(_ENCODERS, models.get_encoder,
                                     _kwargs_schema_from_fields),
            "decoder": _zoo_variants(_DECODERS, models.get_decoder,
                                     _kwargs_schema_from_fields),
            "joiner": _zoo_variants(_JOINERS, models.get_joiner,
                                    _kwargs_schema_from_fields),
            "scheduler": scheduler_schema,
        },
    }


def hyper_config_schema():
    """Schema for hyper-p.json (the reference's sgm_hyper.json)."""
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "cat_tpu hyper-parameter config (hyper-p.json)",
        "type": "object",
        "properties": {
            "data": {"type": "object",
                     "properties": {"train": {}, "dev": {}, "test": {},
                                    "filter": {"type": "string"}}},
            "feature": {"type": "object",
                        "properties": {
                            "num_mel_bins": {"type": "integer",
                                             "default": 80},
                            "sample_rate": {"type": "integer"},
                            "cmvn": {"type": "boolean"},
                            "speed_perturb": {"type": "array"},
                        }},
            "tokenizer": {"type": "object",
                          "properties": {"type": {"type": "string"},
                                         "option-init": {"type": "object"},
                                         "file": {"type": "string"}}},
            "train": {"type": "object",
                      "properties": {"bin": {"type": "string"},
                                     "option": {"type": "object"}},
                      "required": ["bin"]},
            "inference": {"type": "object",
                          "properties": {"split": {},
                                         "decode": {"type": "object"},
                                         "avgmodel": {"type": "object"},
                                         "er": {"type": "object"}}},
            "env": {"type": "object"},
            "commit": {"type": "string"},
        },
    }


def dump_schemas(out_dir=".vscode"):
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, schema in (("sgm_nn.json", nn_config_schema()),
                         ("sgm_hyper.json", hyper_config_schema())):
        p = os.path.join(out_dir, name)
        with open(p, "w") as f:
            json.dump(schema, f, indent=1)
        paths.append(p)
    return paths


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else ".vscode"
    for p in dump_schemas(out):
        print(p)
