from .block import Block, Chain, Identity, pick_block_len
