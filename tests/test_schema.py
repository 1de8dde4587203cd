"""Schema generation (parseschema.py role)."""
import json


def test_nn_schema_covers_zoo(tmp_path):
    from cat_tpu.utils.schema import dump_schemas

    paths = dump_schemas(str(tmp_path))
    nn = json.load(open(paths[0]))
    hyper = json.load(open(paths[1]))

    enc_types = {v["properties"]["type"]["const"]
                 for v in nn["properties"]["encoder"]["oneOf"]}
    assert {"ConformerNet", "LSTM", "TDNN_NAS",
            "JoinAPLinearEncoder"} <= enc_types
    # flax dataclass fields make it into kwargs with defaults
    conf = next(v for v in nn["properties"]["encoder"]["oneOf"]
                if v["properties"]["type"]["const"] == "ConformerNet")
    kw = conf["properties"]["kwargs"]["properties"]
    assert kw["num_cells"]["default"] > 0
    assert "num_classes" not in kw  # injected, not user-facing
    # scheduler enum matches the registry
    from cat_tpu.utils.scheduler import _REGISTRY
    assert set(nn["properties"]["scheduler"]["properties"]["type"]
               ["enum"]) == set(_REGISTRY)
    assert "train" in hyper["properties"]
