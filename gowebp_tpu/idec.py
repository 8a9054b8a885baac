"""Incremental (push) decoding: append bytes, get rows as they decode.

Feature parity target: /root/reference/pkg/libwebp/decoder/idec_dec.c.go
(WebPINewDecoder/WebPIAppend state machine with MB-granular resume).

VP8 path is row-incremental: each appended chunk advances symbol decoding
by whole MB rows (state saved/restored across starvation, the reference's
MBContext concept), and partial RGBA output is available for the rows
whose reconstruction can no longer change (loop-filter lag accounted).
VP8L decodes when the stream is complete (suspend/resume inside the pixel
loop is a later stage).
"""

from __future__ import annotations

import copy

import numpy as np

from .constants import CHUNK_VP8, CHUNK_VP8L
from .container.riff import get_features, parse_riff
from .errors import BitstreamError, NotEnoughData

STATE_HEADER = "header"
STATE_DATA = "data"
STATE_DONE = "done"


class IncrementalDecoder:
    def __init__(self):
        self._buf = bytearray()
        self.state = STATE_HEADER
        self.features = None
        self._vp8 = None       # _VP8RowDecoder
        self._vp8l = None      # _VP8LRowDecoder
        self._output = None
        self._is_lossless = False

    def append(self, chunk: bytes) -> str:
        """Feed more bytes; returns the current state."""
        self._buf.extend(chunk)
        if self.state == STATE_HEADER:
            try:
                self.features = get_features(bytes(self._buf), tolerant=True)
                self.state = STATE_DATA
            except NotEnoughData:
                return self.state
            except BitstreamError:
                # Could still be a truncated header; wait for more bytes.
                if len(self._buf) > 64:
                    raise
                return self.state
        if self.state == STATE_DATA:
            self._advance()
        return self.state

    def _advance(self) -> None:
        data = bytes(self._buf)
        try:
            parsed = parse_riff(data)
            complete = True
        except NotEnoughData:
            parsed = None
            complete = False
        if complete and parsed is not None:
            vp8l = parsed.find(CHUNK_VP8L)
            if vp8l is not None:
                from .models.vp8l.decoder import decode_vp8l

                self._output = decode_vp8l(vp8l.payload)
                self.state = STATE_DONE
                return
            if parsed.find(CHUNK_VP8) is None:
                # RIFF parsed but the image chunk hasn't arrived yet
                # (e.g. header + partial chunk header): keep waiting.
                return
            from .decode import decode_rgba

            self._output = decode_rgba(data)
            self.state = STATE_DONE
            return
        # Partial data: advance the row decoder for the detected format.
        if self.features is not None and self.features.format == "lossy":
            self._advance_vp8(data)
        elif self.features is not None and self.features.format == "lossless":
            self._advance_vp8l(data)

    def _find_chunk_payload(self, data: bytes, want: bytes) -> bytes | None:
        """Span of a chunk's (possibly truncated) payload inside data."""
        try:
            from .container.riff import RIFF_HEADER_SIZE
            import struct

            pos = RIFF_HEADER_SIZE
            while pos + 8 <= len(data):
                tag = data[pos : pos + 4]
                size = struct.unpack_from("<I", data, pos + 4)[0]
                if tag == want:
                    return data[pos + 8 : pos + 8 + size]
                pos += 8 + size + (size & 1)
        except Exception:
            pass
        return None

    def _advance_vp8l(self, data: bytes) -> None:
        from .constants import CHUNK_VP8L

        payload = self._find_chunk_payload(data, CHUNK_VP8L)
        if payload is None:
            return
        if self._vp8l is None:
            try:
                self._vp8l = _VP8LRowDecoder(payload)
            except (NotEnoughData, BitstreamError, IndexError):
                return
        else:
            self._vp8l.update_data(payload)
        self._vp8l.decode_available_rows()

    def _advance_vp8(self, data: bytes) -> None:
        # The VP8 chunk payload may itself be truncated; find its span.
        payload = self._find_chunk_payload(data, CHUNK_VP8)
        if payload is None:
            return
        if self._vp8 is None:
            try:
                self._vp8 = _VP8RowDecoder(payload)
            except (NotEnoughData, BitstreamError):
                return
        else:
            self._vp8.update_data(payload)
        self._vp8.decode_available_rows()

    @property
    def rows_decoded(self) -> int:
        """Finalized output rows available via get_partial_output()."""
        if self.state == STATE_DONE and self._output is not None:
            return self._output.shape[0]
        if self._vp8l is not None:
            return self._vp8l.rows_done
        if self._vp8 is None:
            return 0
        done_mb_rows = max(0, self._vp8.rows_done - 1)  # loop-filter lag
        return min(done_mb_rows * 16, self._vp8.st.height)

    def get_partial_output(self) -> np.ndarray | None:
        """RGBA rows decoded so far (None if nothing is final yet)."""
        if self.state == STATE_DONE:
            return self._output
        n = self.rows_decoded
        if n == 0:
            return None
        if self._vp8l is not None:
            return self._vp8l.partial_rgba(n)
        if self._vp8 is None:
            return None
        return self._vp8.partial_rgba(n)

    def get_output(self) -> np.ndarray:
        if self.state != STATE_DONE:
            raise NotEnoughData("stream incomplete")
        return self._output


def _bd_state(bd):
    return (bd.pos, bd.value, bd.range, bd.bit_count)


def _bd_restore(bd, s):
    bd.pos, bd.value, bd.range, bd.bit_count = s


class _VP8RowDecoder:
    """Row-granular VP8 symbol decoding with save/restore on starvation."""

    def __init__(self, payload: bytes):
        from .models.vp8 import decoder as V

        self.V = V
        self.payload = payload
        self.st, self.bd = V.parse_frame_header(payload)
        self.mbs = [
            [V.MBData() for _ in range(self.st.mb_w)]
            for _ in range(self.st.mb_h)
        ]
        self.ctx_above = [[0, 0] for _ in range(self.st.mb_w)]
        self.intra_t = np.full(4 * self.st.mb_w, 0, np.int32)
        self.rows_done = 0
        self._reset_row_cursor()

    def update_data(self, payload: bytes) -> None:
        """More bytes arrived: extend the partition buffers in place."""
        if len(payload) <= len(self.payload):
            return
        self.payload = payload
        st, bd = self.V.parse_frame_header(payload)
        # Graft the longer buffers onto the live decoder states.
        self.bd.data = bd.data
        for old, new in zip(self.st.partitions, st.partitions):
            old.data = new.data
        self.st.partition_bytes = st.partition_bytes

    def _reset_row_cursor(self) -> None:
        """Per-row MB-granular progress (reference MBContext,
        idec_dec.c.go:271-283): both passes resume mid-row."""
        self._modes_x = 0
        self._resid_x = 0
        self._intra_l = np.full(4, 0, np.int32)
        self._ctx_left = [0, 0]

    def decode_available_rows(self) -> None:
        st = self.st
        while self.rows_done < st.mb_h:
            if not self._decode_row_incremental(self.rows_done):
                return                  # starved mid-row; cursor kept
            self.rows_done += 1
            self._reset_row_cursor()

    def _decode_row_incremental(self, mb_y: int) -> bool:
        """Advance the row's two passes MB by MB; True when complete.

        Each macroblock saves the minimal context (boolean-decoder
        state + the nz/intra context it mutates) before decoding, so a
        mid-row starvation discards only the unfinished MB — the
        reference's MBContext save/restore, not a whole-row replay.
        """
        V = self.V
        st = self.st
        token_bd = st.partitions[mb_y & (len(st.partitions) - 1)]
        row = self.mbs[mb_y]
        while self._modes_x < st.mb_w:
            mb_x = self._modes_x
            mb = row[mb_x]
            sl = self.intra_t[4 * mb_x : 4 * mb_x + 4]
            saved = (_bd_state(self.bd), sl.copy(), self._intra_l.copy())
            try:
                (mb.segment, mb.skip, mb.is_i4, mb.imodes, mb.uvmode) = \
                    V._parse_intra_mode(self.bd, st, sl, self._intra_l)
                if self.bd.exhausted():
                    raise NotEnoughData("partition 0 starved")
            except (BitstreamError, NotEnoughData):
                _bd_restore(self.bd, saved[0])
                sl[:] = saved[1]
                self._intra_l = saved[2]
                return False
            self._modes_x += 1
        while self._resid_x < st.mb_w:
            mb_x = self._resid_x
            mb = row[mb_x]
            saved = (_bd_state(token_bd), list(self.ctx_above[mb_x]),
                     list(self._ctx_left))
            try:
                skip = mb.skip if st.use_skip_proba else 0
                if not skip:
                    empty = V._parse_residuals(
                        token_bd, st, mb, self.ctx_above[mb_x],
                        self._ctx_left
                    )
                    mb.skip = int(empty)
                else:
                    self.ctx_above[mb_x][0] = 0
                    self._ctx_left[0] = 0
                    if not mb.is_i4:
                        self.ctx_above[mb_x][1] = 0
                        self._ctx_left[1] = 0
                    mb.coeffs = np.zeros((25, 16), np.int32)
                    mb.non_zero_y = 0
                    mb.non_zero_uv = 0
                    mb.skip = 1
                if token_bd.exhausted():
                    raise NotEnoughData("token partition starved")
            except (BitstreamError, NotEnoughData):
                _bd_restore(token_bd, saved[0])
                self.ctx_above[mb_x][:] = saved[1]
                self._ctx_left[:] = saved[2]
                return False
            self._resid_x += 1
        return True

    def partial_rgba(self, n_rows: int) -> np.ndarray:
        """Reconstruct + filter + convert the finalized rows."""
        V = self.V
        st = self.st
        mb_rows = self.rows_done
        sub = self.mbs[:mb_rows]
        sub_st = copy.copy(st)
        sub_st.mb_h = mb_rows
        Y, U, V_ = V._reconstruct(sub_st, sub)
        V._loop_filter(sub_st, sub, Y, U, V_)
        # Upsample over the full reconstructed extent so the chroma rows
        # bordering the emitted region interpolate exactly as in a full
        # decode, then crop to the finalized rows.
        H_full = min(st.height, 16 * mb_rows)
        W = st.width
        from .ops import yuv_np

        y = Y[:H_full, :W].astype(np.uint8)
        u = U[: (H_full + 1) // 2, : (W + 1) // 2].astype(np.uint8)
        v = V_[: (H_full + 1) // 2, : (W + 1) // 2].astype(np.uint8)
        uf = yuv_np.fancy_upsample(u, H_full, W)
        vf = yuv_np.fancy_upsample(v, H_full, W)
        rgb = yuv_np.yuv_to_rgb(y, uf, vf)
        H = min(n_rows, st.height)
        out = np.empty((H, W, 4), np.uint8)
        out[..., :3] = rgb[:H]
        out[..., 3] = 255
        return out


class _VP8LRowDecoder:
    """Incremental VP8L: suspend/resume over a growing chunk payload.

    Reference mechanism: vp8l_dec.c.go SaveState/RestoreState +
    VP8_STATUS_SUSPENDED (SURVEY.md §2.3, §3.5); the checkpointing loop
    itself lives in models/vp8l/decoder.VP8LIncrementalPixels.
    """

    def __init__(self, payload: bytes):
        from .models.vp8l.decoder import (
            VP8LIncrementalPixels,
            _parse_stream_header,
            decode_vp8l_header,
        )
        from .entropy.bitio import BitReader

        self.payload = payload
        self.width, self.height, _ = decode_vp8l_header(payload)
        br = BitReader(payload[1:])
        br.skip_bits(14 + 14 + 1 + 3)
        hdr = _parse_stream_header(br, self.width, self.height,
                                   top_level=True)
        if br.eos:
            raise NotEnoughData("VP8L entropy headers incomplete")
        self._pix = VP8LIncrementalPixels(self.width, self.height, hdr,
                                          br.bit_pos)
        self._done = False

    def update_data(self, payload: bytes) -> None:
        self.payload = payload

    def decode_available_rows(self) -> None:
        if not self._done:
            self._done = self._pix.resume(self.payload[1:])

    @property
    def rows_done(self) -> int:
        return self._pix.rows_ready()

    def _to_rgba(self, argb: np.ndarray) -> np.ndarray:
        a = (argb >> 24) & 0xFF
        r = (argb >> 16) & 0xFF
        g = (argb >> 8) & 0xFF
        b = argb & 0xFF
        return np.stack([r, g, b, a], axis=-1).astype(np.uint8)

    def partial_rgba(self, n_rows: int) -> np.ndarray:
        from .models.vp8l.decoder import _apply_inverse_transforms

        argb = self._pix.partial_argb()
        if argb.shape[0] == 0:
            return np.zeros((0, self.width, 4), np.uint8)
        argb = _apply_inverse_transforms(argb, self._pix.transforms)
        return self._to_rgba(argb[:n_rows])


__all__ = ["IncrementalDecoder", "STATE_HEADER", "STATE_DATA", "STATE_DONE"]
