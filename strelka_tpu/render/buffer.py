"""Buffer abstraction — port of include/render/buffer.h:16-97.

A Buffer wraps a device (jax) array with a host mirror; map() performs the
device->host copy (the analog of OptixBuffer::map's cudaMemcpy D2H,
src/render/optix/OptixBuffer.cpp:36-42).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class BufferFormat(enum.IntEnum):
    UNSIGNED_BYTE4 = 0
    FLOAT4 = 1
    FLOAT3 = 2


_CHANNELS = {BufferFormat.UNSIGNED_BYTE4: 4, BufferFormat.FLOAT4: 4, BufferFormat.FLOAT3: 3}
_DTYPE = {
    BufferFormat.UNSIGNED_BYTE4: np.uint8,
    BufferFormat.FLOAT4: np.float32,
    BufferFormat.FLOAT3: np.float32,
}


@dataclass
class BufferDesc:
    width: int = 0
    height: int = 0
    format: BufferFormat = BufferFormat.FLOAT4


@dataclass
class ImageBuffer:
    """Host image view handed to displays/writers (buffer.h:66-97)."""

    data: Optional[np.ndarray] = None
    width: int = 0
    height: int = 0
    pixel_format: BufferFormat = BufferFormat.FLOAT4


class Buffer:
    """Device image buffer with a host mirror."""

    def __init__(self, desc: BufferDesc):
        self._desc = desc
        ch = _CHANNELS[desc.format]
        self._device: jnp.ndarray = jnp.zeros((desc.height, desc.width, ch), _DTYPE[desc.format])
        self._host: Optional[np.ndarray] = None

    def width(self) -> int:
        return self._desc.width

    def height(self) -> int:
        return self._desc.height

    def format(self) -> BufferFormat:
        return self._desc.format

    def resize(self, width: int, height: int) -> None:
        if (width, height) == (self._desc.width, self._desc.height):
            return
        self._desc.width, self._desc.height = width, height
        ch = _CHANNELS[self._desc.format]
        self._device = jnp.zeros((height, width, ch), _DTYPE[self._desc.format])
        self._host = None

    def set_device(self, arr: jnp.ndarray) -> None:
        if self._desc.format == BufferFormat.UNSIGNED_BYTE4 and arr.dtype != jnp.uint8:
            arr = (jnp.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        self._device = arr

    def device(self) -> jnp.ndarray:
        return self._device

    def map(self) -> np.ndarray:
        """Device -> host copy (blocks on the in-flight computation)."""
        self._host = np.asarray(jax.device_get(self._device))
        return self._host

    def unmap(self) -> None:
        pass  # host mirror stays valid; parity with reference API

    def get_host_pointer(self) -> Optional[np.ndarray]:
        return self._host

    def as_image(self) -> ImageBuffer:
        if self._host is None:
            self.map()
        return ImageBuffer(
            data=self._host,
            width=self._desc.width,
            height=self._desc.height,
            pixel_format=self._desc.format,
        )
