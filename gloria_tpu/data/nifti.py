"""Minimal hermetic NIfTI-1 I/O (single-file .nii, uncompressed).

The reference's optional MIMIC ingestion stage converts DICOM pixel arrays to
NIfTI before caching (``/root/reference/gloria/datasets/mimic_data.py:167-235``
via nibabel).  nibabel is not in this image, so the subset of NIfTI-1 the
pipeline needs — write an ndarray, read it back — is implemented directly:
348-byte header + 4-byte extension flag + raw little-endian data at offset
352 (the reference writes ``Nifti1Image(image, None)``, i.e. no affine/scaling
either).
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {
    np.dtype(np.uint8): (2, 8),
    np.dtype(np.int16): (4, 16),
    np.dtype(np.int32): (8, 32),
    np.dtype(np.float32): (16, 32),
    np.dtype(np.float64): (64, 64),
}
_CODES = {code: dt for dt, (code, _) in _DTYPES.items()}
_MAGIC = b"n+1\x00"
_HDR_SIZE = 348
_VOX_OFFSET = 352.0


def save_nifti(path: str, image: np.ndarray) -> None:
    image = np.asarray(image)
    if image.dtype not in _DTYPES:
        image = image.astype(np.float32)
    if image.ndim > 7:
        raise ValueError(f"NIfTI supports ≤7 dims, got {image.ndim}")
    code, bitpix = _DTYPES[image.dtype]

    hdr = bytearray(_HDR_SIZE)
    struct.pack_into("<i", hdr, 0, _HDR_SIZE)                    # sizeof_hdr
    dims = [image.ndim] + list(image.shape) + [1] * (7 - image.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)                      # dim
    struct.pack_into("<h", hdr, 70, code)                        # datatype
    struct.pack_into("<h", hdr, 72, bitpix)                      # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, *(1.0,) * 7)           # pixdim
    struct.pack_into("<f", hdr, 108, _VOX_OFFSET)                # vox_offset
    struct.pack_into("<f", hdr, 112, 0.0)                        # scl_slope (none)
    hdr[344:348] = _MAGIC
    with open(path, "wb") as fh:
        fh.write(bytes(hdr))
        fh.write(b"\x00" * 4)  # no header extensions
        # NIfTI data is Fortran-ordered on disk
        fh.write(np.asfortranarray(image).tobytes(order="F"))


def load_nifti(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        hdr = fh.read(_HDR_SIZE)
        if len(hdr) < _HDR_SIZE or struct.unpack_from("<i", hdr, 0)[0] != _HDR_SIZE:
            raise ValueError(f"not a little-endian NIfTI-1 file: {path}")
        if hdr[344:348] not in (_MAGIC, b"ni1\x00"):
            raise ValueError(f"bad NIfTI magic in {path}")
        dims = struct.unpack_from("<8h", hdr, 40)
        shape = tuple(dims[1 : 1 + dims[0]])
        code = struct.unpack_from("<h", hdr, 70)[0]
        if code not in _CODES:
            raise ValueError(f"unsupported NIfTI datatype code {code}")
        vox_offset = int(struct.unpack_from("<f", hdr, 108)[0]) or int(_VOX_OFFSET)
        fh.seek(vox_offset)
        data = np.frombuffer(fh.read(), dtype=_CODES[code])
    return data[: int(np.prod(shape))].reshape(shape, order="F")
