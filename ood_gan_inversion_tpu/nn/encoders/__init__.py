from .e4e import Encoder4Editing, GradualStyleBlock, PROGRESSIVE_INFERENCE
