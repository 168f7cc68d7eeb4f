"""Pandas-on-h5py table store.

The reference stores every result as pandas-HDF5 via PyTables
(analysis/pipeline.py:231-293, seqdataio.py). This environment has h5py but
not PyTables, so this module provides an ``HDFStore``-compatible subset on
plain h5py: ``store[key] = frame_or_series`` / ``store[key]`` round-trips
DataFrames (including string and categorical-as-string columns) and Series,
preserving dtypes and index.

Layout per key: one group with a ``__kind__`` attr ('frame' | 'series'),
one dataset per column plus ``__index__`` (and ``__index_name__``/column
order attrs).
"""

import numpy as np
import pandas as pd
import h5py


_STR_DTYPE = h5py.string_dtype(encoding='utf-8')


def _encode_array(values):
    values = np.asarray(values)
    if values.dtype == object or values.dtype.kind in ('U', 'S'):
        return np.asarray([('' if v is None else str(v)) for v in values],
                          dtype=object), _STR_DTYPE
    if values.dtype.kind == 'b':
        return values.astype(np.uint8), 'bool'
    return values, None


def _write_array(group, name, values):
    data, dtype = _encode_array(values)
    if dtype is _STR_DTYPE:
        ds = group.create_dataset(name, data=data.astype(_STR_DTYPE))
        ds.attrs['__dtype__'] = 'str'
    elif dtype == 'bool':
        ds = group.create_dataset(name, data=data)
        ds.attrs['__dtype__'] = 'bool'
    else:
        ds = group.create_dataset(name, data=data)


def _read_array(group, name):
    ds = group[name]
    values = ds[()]
    kind = ds.attrs.get('__dtype__', None)
    if kind == 'str':
        return np.asarray([v.decode('utf-8') if isinstance(v, bytes) else v
                           for v in values], dtype=object)
    if kind == 'bool':
        return values.astype(bool)
    return values


class HDFStore:
    """Minimal pandas.HDFStore work-alike over h5py."""

    def __init__(self, path, mode='r'):
        self._file = h5py.File(path, mode)

    # -- context management --------------------------------------------------

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()

    def close(self):
        self._file.close()

    # -- dict interface ------------------------------------------------------

    @staticmethod
    def _norm(key):
        return '/' + key.strip('/')

    def keys(self):
        found = []

        def visit(name, obj):
            if isinstance(obj, h5py.Group) and '__kind__' in obj.attrs:
                found.append('/' + name)
        self._file.visititems(visit)
        return found

    def items(self):
        return [(k, self[k]) for k in self.keys()]

    def __contains__(self, key):
        return self._norm(key) in [k for k in self.keys()]

    def __setitem__(self, key, value):
        key = self._norm(key)
        if key in self._file:
            del self._file[key]
        group = self._file.create_group(key)

        if isinstance(value, pd.Series):
            group.attrs['__kind__'] = 'series'
            group.attrs['__name__'] = '' if value.name is None else str(value.name)
            _write_array(group, '__values__', value.values)
            _write_array(group, '__index__', value.index.values)
            group.attrs['__index_name__'] = '' if value.index.name is None else str(value.index.name)
        elif isinstance(value, pd.DataFrame):
            group.attrs['__kind__'] = 'frame'
            group.attrs['__columns__'] = [str(c) for c in value.columns]
            for col in value.columns:
                _write_array(group, 'col_' + str(col), value[col].values)
            _write_array(group, '__index__', value.index.values)
            group.attrs['__index_name__'] = '' if value.index.name is None else str(value.index.name)
        else:
            raise TypeError('can only store DataFrame or Series, got {}'.format(type(value)))

    def __getitem__(self, key):
        key = self._norm(key)
        if key not in self._file:
            raise KeyError(key)
        group = self._file[key]
        kind = group.attrs['__kind__']
        index = pd.Index(_read_array(group, '__index__'))
        index_name = group.attrs.get('__index_name__', '')
        if index_name:
            index.name = index_name

        if kind == 'series':
            name = group.attrs.get('__name__', '') or None
            return pd.Series(_read_array(group, '__values__'), index=index, name=name)

        columns = list(group.attrs['__columns__'])
        data = {col: _read_array(group, 'col_' + col) for col in columns}
        return pd.DataFrame(data, index=index, columns=columns)


def read_hdf(path, key):
    """pandas.read_hdf work-alike for stores written by HDFStore."""
    with HDFStore(path, 'r') as store:
        return store[key]
