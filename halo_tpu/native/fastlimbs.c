/* CPython extension: bulk conversion between Python ints and 256-bit
 * little-endian limb buffers.
 *
 * The pure-Python paths (ff.ints_to_array / ff.array_to_ints: a generator
 * of int.to_bytes joined into one buffer) profile at ~2.4 us/element; the
 * IVC arithmetizer converts ~2.2M field elements per step at 2^16 rows
 * (~5 s/step).  _PyLong_AsByteArray / _PyLong_FromByteArray do the same
 * conversion at ~0.1 us/element.
 *
 * Loaded lazily by halo_tpu/native/__init__.py with the same build-on-
 * first-import scheme as pasta_native.cpp; every caller keeps the Python
 * fallback, so a missing toolchain only costs speed.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

/* ints -> one bytes object of n*32 little-endian bytes */
static PyObject *ints_to_bytes256(PyObject *self, PyObject *arg) {
  PyObject *seq = PySequence_Fast(arg, "expected a sequence of ints");
  if (!seq) return NULL;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  PyObject *out = PyBytes_FromStringAndSize(NULL, n * 32);
  if (!out) { Py_DECREF(seq); return NULL; }
  unsigned char *buf = (unsigned char *)PyBytes_AS_STRING(out);
  PyObject **items = PySequence_Fast_ITEMS(seq);
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject *v = items[i];
    if (!PyLong_Check(v)) {
      Py_DECREF(seq); Py_DECREF(out);
      PyErr_SetString(PyExc_TypeError, "sequence items must be int");
      return NULL;
    }
    if (_PyLong_AsByteArray((PyLongObject *)v, buf + i * 32, 32,
                            /*little_endian=*/1, /*is_signed=*/0) < 0) {
      Py_DECREF(seq); Py_DECREF(out);
      return NULL; /* negative or > 2^256-1 */
    }
  }
  Py_DECREF(seq);
  return out;
}

/* buffer of n*32 little-endian bytes -> list of n ints */
static PyObject *bytes256_to_ints(PyObject *self, PyObject *arg) {
  Py_buffer view;
  if (PyObject_GetBuffer(arg, &view, PyBUF_SIMPLE) < 0) return NULL;
  if (view.len % 32) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "buffer length must be a multiple of 32");
    return NULL;
  }
  Py_ssize_t n = view.len / 32;
  PyObject *out = PyList_New(n);
  if (!out) { PyBuffer_Release(&view); return NULL; }
  const unsigned char *buf = (const unsigned char *)view.buf;
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject *v = _PyLong_FromByteArray(buf + i * 32, 32,
                                        /*little_endian=*/1, /*is_signed=*/0);
    if (!v) { PyBuffer_Release(&view); Py_DECREF(out); return NULL; }
    PyList_SET_ITEM(out, i, v);
  }
  PyBuffer_Release(&view);
  return out;
}

static PyMethodDef methods[] = {
    {"ints_to_bytes256", ints_to_bytes256, METH_O,
     "sequence of ints in [0, 2^256) -> bytes of 32-byte LE words"},
    {"bytes256_to_ints", bytes256_to_ints, METH_O,
     "buffer of 32-byte LE words -> list of ints"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastlimbs",
    "bulk int <-> 256-bit limb conversion", -1, methods};

PyMODINIT_FUNC PyInit_fastlimbs(void) { return PyModule_Create(&moduledef); }
