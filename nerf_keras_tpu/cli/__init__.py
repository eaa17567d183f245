"""CLI layer: the reference's entry-point surface (train_lego / train_fern /
train_tpu_* / inference / visualization) over one shared implementation."""
