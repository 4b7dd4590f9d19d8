"""Raw binary array dumps for cross-implementation validation.

Parity with the reference's debug facility (write_array /
write_device_array / write_device_vector, include/impl/util.hpp:55-91),
which dumps device arrays as raw little-endian binaries for MATLAB-side
comparison (matlab/utils/compare_data_with_pcl.m). Here any JAX/NumPy array
can be dumped/loaded the same way; golden tests normally make this
unnecessary (JAX arrays are directly inspectable), but the format is kept
for auditing against external implementations.
"""

from __future__ import annotations

import numpy as np


def dump_array(path, arr) -> None:
    """Write the raw little-endian bytes of `arr` (C order, no header) —
    the reference's write_device_vector format."""
    a = np.ascontiguousarray(np.asarray(arr))
    if a.dtype.byteorder == ">":
        a = a.astype(a.dtype.newbyteorder("<"))
    with open(path, "wb") as f:
        f.write(a.tobytes())


def load_array(path, dtype, shape=None):
    """Read a raw dump back. shape=None returns a flat array."""
    data = np.fromfile(path, dtype=np.dtype(dtype).newbyteorder("<"))
    if shape is not None:
        data = data.reshape(shape)
    return data
