"""Host-side frame data model: Plane / Frame / PackedFrame / FrameBufferPool.

API-compatible with the reference data model
(/root/reference/nano_hevc/frame.py:16-308).  On TPU, frames live as
device arrays produced by `nanohevc_tpu.ops.tiling`; these classes are
the host staging layer (raw YUV420p bytes <-> numpy planes) and the
public-API surface.  XLA owns device memory, so PackedFrame /
FrameBufferPool matter only for host buffer reuse.
"""

from __future__ import annotations

from typing import List, Set, Tuple

import numpy as np

__all__ = [
    "Plane",
    "Frame",
    "PackedFrame",
    "FrameBufferPool",
]


class Plane:
    """One color plane (Y, U or V) as a C-contiguous 2-D array."""

    __slots__ = ("data",)

    def __init__(self, data: np.ndarray):
        self.data = data

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def shape(self) -> Tuple[int, int]:
        return self.data.shape[:2]

    @classmethod
    def zeros(cls, height: int, width: int, dtype: np.dtype = np.int16) -> "Plane":
        return cls(np.zeros((height, width), dtype=dtype, order="C"))

    @classmethod
    def from_buffer(
        cls, buffer: bytes, height: int, width: int, dtype: np.dtype = np.uint8
    ) -> "Plane":
        data = np.frombuffer(buffer, dtype=dtype).reshape(height, width)
        return cls(np.ascontiguousarray(data))

    def __repr__(self) -> str:
        return f"Plane(shape={self.shape}, dtype={self.data.dtype})"


class Frame:
    """A YUV420p frame: full-resolution Y, half-resolution U and V."""

    __slots__ = ("y", "u", "v")

    def __init__(self, y: Plane, u: Plane, v: Plane):
        self.y = y
        self.u = u
        self.v = v

    @property
    def height(self) -> int:
        return self.y.height

    @property
    def width(self) -> int:
        return self.y.width

    @classmethod
    def zeros(cls, height: int, width: int, dtype: np.dtype = np.int16) -> "Frame":
        return cls(
            Plane.zeros(height, width, dtype),
            Plane.zeros(height // 2, width // 2, dtype),
            Plane.zeros(height // 2, width // 2, dtype),
        )

    @classmethod
    def from_yuv420p(cls, buffer: bytes, height: int, width: int) -> "Frame":
        """Split a raw planar YUV420p byte buffer (Y then U then V)."""
        ys = height * width
        uh, uw = height // 2, width // 2
        us = uh * uw
        return cls(
            Plane.from_buffer(buffer[:ys], height, width),
            Plane.from_buffer(buffer[ys : ys + us], uh, uw),
            Plane.from_buffer(buffer[ys + us : ys + 2 * us], uh, uw),
        )

    def to_yuv420p(self) -> bytes:
        """Serialize back to raw planar YUV420p bytes."""
        return (
            self.y.data.astype(np.uint8).tobytes()
            + self.u.data.astype(np.uint8).tobytes()
            + self.v.data.astype(np.uint8).tobytes()
        )

    def __repr__(self) -> str:
        return f"Frame(height={self.height}, width={self.width})"


class PackedFrame:
    """YUV420p frame over one contiguous allocation (Y | U | V views)."""

    __slots__ = ("_buffer", "y", "u", "v", "height", "width", "_y_size", "_uv_size")

    def __init__(self, height: int, width: int, dtype: np.dtype = np.int16):
        self.height = height
        self.width = width
        self._y_size = height * width
        uh, uw = height // 2, width // 2
        self._uv_size = uh * uw
        self._buffer = np.zeros(self._y_size + 2 * self._uv_size, dtype=dtype, order="C")
        self.y = self._buffer[: self._y_size].reshape(height, width)
        self.u = self._buffer[self._y_size : self._y_size + self._uv_size].reshape(uh, uw)
        self.v = self._buffer[self._y_size + self._uv_size :].reshape(uh, uw)

    @classmethod
    def from_yuv420p(cls, buffer: bytes, height: int, width: int) -> "PackedFrame":
        pf = cls(height, width, dtype=np.uint8)
        data = np.frombuffer(buffer, dtype=np.uint8)
        np.copyto(pf._buffer, data[: len(pf._buffer)])
        return pf

    @classmethod
    def from_frame(cls, frame: Frame) -> "PackedFrame":
        pf = cls(frame.height, frame.width, dtype=frame.y.data.dtype)
        np.copyto(pf.y, frame.y.data)
        np.copyto(pf.u, frame.u.data)
        np.copyto(pf.v, frame.v.data)
        return pf

    def to_yuv420p(self) -> bytes:
        return self._buffer.astype(np.uint8).tobytes()

    def to_frame(self) -> Frame:
        return Frame(Plane(self.y.copy()), Plane(self.u.copy()), Plane(self.v.copy()))

    def clear(self) -> None:
        self._buffer.fill(0)

    def __repr__(self) -> str:
        return (
            f"PackedFrame(height={self.height}, width={self.width}, "
            f"dtype={self._buffer.dtype})"
        )


class FrameBufferPool:
    """Fixed pool of pre-allocated host frames with acquire/release."""

    __slots__ = ("_pool", "_available", "_in_use", "height", "width", "dtype")

    def __init__(
        self,
        height: int,
        width: int,
        pool_size: int = 4,
        dtype: np.dtype = np.int16,
        use_packed: bool = True,
    ):
        self.height = height
        self.width = width
        self.dtype = dtype
        make = (
            (lambda: PackedFrame(height, width, dtype=dtype))
            if use_packed
            else (lambda: Frame.zeros(height, width, dtype=dtype))
        )
        self._pool: List[PackedFrame | Frame] = [make() for _ in range(pool_size)]
        self._available: List[int] = list(range(pool_size))
        self._in_use: Set[int] = set()

    def acquire(self, clear: bool = True) -> Tuple[int, "PackedFrame | Frame"]:
        """Take a buffer out of the pool; raises RuntimeError when empty."""
        if not self._available:
            raise RuntimeError(
                f"No buffers available in pool. "
                f"In use: {len(self._in_use)}, Total: {len(self._pool)}"
            )
        idx = self._available.pop()
        self._in_use.add(idx)
        frame = self._pool[idx]
        if clear:
            if isinstance(frame, PackedFrame):
                frame.clear()
            else:
                frame.y.data.fill(0)
                frame.u.data.fill(0)
                frame.v.data.fill(0)
        return idx, frame

    def release(self, idx: int) -> None:
        """Return a buffer; raises ValueError on double-release."""
        if idx not in self._in_use:
            raise ValueError(f"Buffer {idx} is not currently in use")
        self._in_use.remove(idx)
        self._available.append(idx)

    @property
    def available_count(self) -> int:
        return len(self._available)

    @property
    def in_use_count(self) -> int:
        return len(self._in_use)

    @property
    def pool_size(self) -> int:
        return len(self._pool)

    def __repr__(self) -> str:
        return (
            f"FrameBufferPool(height={self.height}, width={self.width}, "
            f"available={self.available_count}/{self.pool_size})"
        )
