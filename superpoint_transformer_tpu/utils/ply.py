"""Minimal PLY reader/writer (ascii + binary little/big endian) —
replaces the reference's plyfile dependency for DALES / KITTI-360 /
ScanNet raw data."""
import numpy as np

__all__ = ['read_ply', 'write_ply']

_PLY_TYPES = {
    'char': 'i1', 'uchar': 'u1', 'short': 'i2', 'ushort': 'u2',
    'int': 'i4', 'uint': 'u4', 'int8': 'i1', 'uint8': 'u1',
    'int16': 'i2', 'uint16': 'u2', 'int32': 'i4', 'uint32': 'u4',
    'float': 'f4', 'double': 'f8', 'float32': 'f4', 'float64': 'f8'}


def read_ply(path):
    """Read a PLY file; returns {element_name: structured ndarray}.
    List properties are not supported for binary files (not needed for
    the point-cloud datasets we target)."""
    with open(path, 'rb') as f:
        line = f.readline().strip()
        if line != b'ply':
            raise ValueError('not a PLY file')
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype_str)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError('unexpected EOF in header')
            tokens = line.strip().split()
            if not tokens:
                continue
            key = tokens[0]
            if key == b'format':
                fmt = tokens[1].decode()
            elif key == b'element':
                elements.append(
                    [tokens[1].decode(), int(tokens[2]), []])
            elif key == b'property':
                if tokens[1] == b'list':
                    elements[-1][2].append(
                        (tokens[4].decode(), 'list',
                         _PLY_TYPES[tokens[2].decode()],
                         _PLY_TYPES[tokens[3].decode()]))
                else:
                    elements[-1][2].append(
                        (tokens[2].decode(),
                         _PLY_TYPES[tokens[1].decode()]))
            elif key == b'end_header':
                break
        out = {}
        if fmt == 'ascii':
            for name, count, props in elements:
                if any(len(p) == 4 for p in props):
                    # list properties: parse row by row
                    rows = [f.readline().split() for _ in range(count)]
                    out[name] = rows
                    continue
                dt = np.dtype([(p[0], p[1]) for p in props])
                arr = np.loadtxt(
                    [f.readline() for _ in range(count)],
                    dtype=np.float64, ndmin=2)
                rec = np.zeros(count, dtype=dt)
                for j, p in enumerate(props):
                    rec[p[0]] = arr[:, j]
                out[name] = rec
        else:
            endian = '<' if 'little' in fmt else '>'
            for name, count, props in elements:
                if any(len(p) == 4 for p in props):
                    raise NotImplementedError(
                        'binary list properties unsupported')
                dt = np.dtype([(p[0], endian + p[1]) for p in props])
                out[name] = np.frombuffer(
                    f.read(dt.itemsize * count), dtype=dt)
        return out


def write_ply(path, vertex_dict, comments=()):
    """Write a binary-little-endian PLY with a single 'vertex' element
    from a dict of same-length 1D arrays."""
    names = list(vertex_dict.keys())
    n = len(vertex_dict[names[0]])
    inv = {v: k for k, v in _PLY_TYPES.items()}
    cols = {k: np.ascontiguousarray(v) for k, v in vertex_dict.items()}
    dt = np.dtype([(k, '<' + cols[k].dtype.str[1:]) for k in names])
    rec = np.zeros(n, dtype=dt)
    for k in names:
        rec[k] = cols[k]
    with open(path, 'wb') as f:
        f.write(b'ply\nformat binary_little_endian 1.0\n')
        for c in comments:
            f.write(f'comment {c}\n'.encode())
        f.write(f'element vertex {n}\n'.encode())
        for k in names:
            t = inv[cols[k].dtype.str[1:]]
            f.write(f'property {t} {k}\n'.encode())
        f.write(b'end_header\n')
        rec.tofile(f)
