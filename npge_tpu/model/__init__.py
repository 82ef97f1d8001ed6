from npge_tpu.model.arena import GenomeArena, SeqName  # noqa: F401
from npge_tpu.model.blocks import Block, BlockSet  # noqa: F401
