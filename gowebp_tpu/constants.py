"""Format constants for the WebP container and VP8/VP8L bitstreams.

These values come from the WebP container spec, the VP8L lossless bitstream
spec, and RFC 6386 (VP8).  The reference catalogues the same constants in
/root/reference/pkg/constants/format_constants.go:16-79; ours are written
fresh from the specs.
"""

# ---------------------------------------------------------------------------
# RIFF container
# ---------------------------------------------------------------------------
RIFF_MAGIC = b"RIFF"
WEBP_MAGIC = b"WEBP"
CHUNK_HEADER_SIZE = 8          # fourcc + uint32 payload size
RIFF_HEADER_SIZE = 12          # "RIFF" + size + "WEBP"
TAG_SIZE = 4

CHUNK_VP8 = b"VP8 "
CHUNK_VP8L = b"VP8L"
CHUNK_VP8X = b"VP8X"
CHUNK_ALPHA = b"ALPH"
CHUNK_ANIM = b"ANIM"
CHUNK_ANMF = b"ANMF"
CHUNK_ICCP = b"ICCP"
CHUNK_EXIF = b"EXIF"
CHUNK_XMP = b"XMP "

VP8X_CHUNK_SIZE = 10
ANIM_CHUNK_SIZE = 6
ANMF_CHUNK_SIZE = 16           # frame header portion (before sub-chunks)

# VP8X feature flags (byte 0 of the VP8X payload).
VP8X_FLAG_ANIMATION = 0x02
VP8X_FLAG_XMP = 0x04
VP8X_FLAG_EXIF = 0x08
VP8X_FLAG_ALPHA = 0x10
VP8X_FLAG_ICC = 0x20

# ANMF per-frame flag bits (byte 15 of the frame header).
ANMF_FLAG_NO_BLEND = 0x02      # 1 = do not blend (overwrite)
ANMF_FLAG_DISPOSE_BACKGROUND = 0x01

MAX_CANVAS_SIZE = 1 << 24      # VP8X canvas dims are 24-bit (value-1 stored)
MAX_IMAGE_AREA = 1 << 32

# ---------------------------------------------------------------------------
# VP8 (lossy) bitstream — RFC 6386
# ---------------------------------------------------------------------------
VP8_SIGNATURE = 0x9D012A       # 3-byte start code after the frame tag
VP8_FRAME_HEADER_SIZE = 10     # frame tag (3) + start code (3) + dims (4)
VP8_MAX_PARTITIONS = 8
VP8_NUM_SEGMENTS = 4
VP8_MAX_DIMENSION = (1 << 14) - 1   # 14-bit width/height

# ---------------------------------------------------------------------------
# VP8L (lossless) bitstream
# ---------------------------------------------------------------------------
VP8L_SIGNATURE = 0x2F          # one-byte signature
VP8L_VERSION = 0
VP8L_IMAGE_SIZE_BITS = 14      # width-1 / height-1 stored on 14 bits
VP8L_FRAME_HEADER_SIZE = 5     # signature byte + 4 bytes of dims/flags
VP8L_MAX_NUM_BIT_READ = 24

NUM_LITERAL_CODES = 256
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40
NUM_CODE_LENGTH_CODES = 19
HUFFMAN_CODES_PER_META_CODE = 5

MAX_PALETTE_SIZE = 256
MAX_CACHE_BITS = 11
MAX_TRANSFORM_BITS = 6
MIN_TRANSFORM_BITS = 2
MAX_HUFFMAN_BITS = 9           # meta-huffman subsample bits: 2 + ReadBits(3)
NUM_TRANSFORMS = 4

# Order in which code-length code lengths appear in the stream.
CODE_LENGTH_CODE_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)
MAX_ALLOWED_CODE_LENGTH = 15
CODE_LENGTH_LITERALS = 16      # symbols 0..15 are literal code lengths
CODE_LENGTH_REPEAT_CODE = 16   # 16: repeat previous, 17/18: repeat zero

# (repeat_offset, extra_bits) for code-length symbols 16, 17, 18.
CODE_LENGTH_REPEATS = ((3, 2), (3, 3), (11, 7))

# Color cache multiplicative hash (Knuth constant used by the format).
HASH_MUL = 0x1E35A7BD

ARGB_BLACK = 0xFF000000

# VP8L transform types (2-bit field in the stream).
PREDICTOR_TRANSFORM = 0
COLOR_TRANSFORM = 1
SUBTRACT_GREEN_TRANSFORM = 2
COLOR_INDEXING_TRANSFORM = 3
