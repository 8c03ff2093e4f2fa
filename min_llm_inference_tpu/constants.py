"""Framework-wide constants.

TPU-native analogue of the reference's compile-time constants
(/root/reference/include/constants.h:3-18). GPU-specific tile/block sizes
(TILE_SIZE, WARP_SIZE, BLOCK_DIM) have no meaning here — TPU kernel tiling
lives with the Pallas kernels (ops/) and is sized to MXU/VPU lanes instead.
"""

# Sentinel written to the decode-result row of an empty batch slot
# (reference: EMPTY_ROW_TOKEN_ID, constants.h; decoder.cu:33-38).
EMPTY_ROW_TOKEN_ID: int = -1

# Token id whose emission terminates a sequence
# (reference: EOF_TOKEN_ID = 1023, constants.h).
EOF_TOKEN_ID: int = 1023

# Tokens per KV page. The reference fixes PAGE_BLOCK_SIZE = 16
# (constants.h); here it is the *default* — the TPU build makes it a config
# knob because larger pages amortize DMA setup better on TPU (page rows are
# the sublane dim of a [page_size, emb] tile; 16 is the bf16 minimum).
DEFAULT_PAGE_SIZE: int = 16

# Minimum pages granted to a newly admitted request
# (reference: DEFAULT_INIT_NUM_BLOCKS = 4, constants.h;
# paged_item_storage.cpp:89-101).
DEFAULT_INIT_NUM_BLOCKS: int = 4
