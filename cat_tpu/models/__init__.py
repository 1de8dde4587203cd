"""Model zoo: encoders, decoders (predictors/LMs), joiners.

Flax.linen re-implementations of the reference's torch model zoo
(/root/reference/cat/shared/{layer,encoder,decoder}.py,
cat/rnnt/joiner.py), registered by class name for config reflection
(mirroring getattr(model_zoo, cfg["type"]) in cat/ctc/train.py:328).
"""

from cat_tpu.models import encoders, decoders, joiner  # noqa: F401


def get_encoder(name):
    return getattr(encoders, name)


def get_decoder(name):
    return getattr(decoders, name)


def get_joiner(name):
    return getattr(joiner, name)
