"""Exception types for the codec.

The reference plumbs C-style int status codes everywhere
(/root/reference/pkg/libwebp/webp/decode.go VP8StatusCode); we use
exceptions, per SURVEY.md §7 "What NOT to replicate".
"""


class WebPError(Exception):
    """Base class for all codec errors."""


class BitstreamError(WebPError):
    """Malformed or truncated bitstream."""


class NotEnoughData(BitstreamError):
    """Input ended before the decoder finished (streaming: suspend point)."""


class UnsupportedFeature(WebPError):
    """Valid bitstream using a feature we do not handle yet."""


class InvalidConfig(WebPError):
    """Encoder/decoder configuration failed validation."""


class EncodeError(WebPError):
    """Encoder-side failure."""
