// ofot_io — native image I/O for the framework's data-loading path.
//
// CPython extension (no pybind11 dependency) exposing fast grayscale PNG
// decode/encode via libpng.  The reference's data path is PIL-only; this
// keeps the sweep's host-side input pipeline off the Python interpreter.
// RGB->luma follows PIL's convert('L') exactly (ITU-R 601-2 with the same
// fixed-point rounding) so outputs are bit-identical to the PIL fallback.
//
// Build: make -C ofot_tpu/native  (produces _ofot_io.<abi>.so)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <png.h>

#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// PIL ImagingConvert.c L24 macro: (R*19595 + G*38470 + B*7471 + 0x8000) >> 16
inline unsigned char luma(unsigned r, unsigned g, unsigned b) {
    return static_cast<unsigned char>(
        (r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
}

PyObject* read_grayscale_png(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

    FILE* f = std::fopen(path, "rb");
    if (!f) {
        PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
        return nullptr;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
        std::fclose(f);
        PyErr_SetString(PyExc_RuntimeError, "png struct alloc failed");
        return nullptr;
    }
    // Declared BEFORE setjmp: a libpng longjmp must not jump over the
    // initialization of non-trivial objects (UB + leaked buffers on every
    // corrupt PNG); constructed empty here, they are live at the jump
    // target and their destructors run on the error return below.
    std::vector<unsigned char> img;
    std::vector<png_bytep> rows;
    std::vector<unsigned char> out;
    png_uint_32 w = 0, h = 0;
    int ok = 1;
    // GIL released around the pure-C decode (review, round 4): no Python
    // API is touched inside, and setjmp is the ENTIRE controlling
    // expression (the read path's previous form was already conforming;
    // the write path's `!png || setjmp(...)` operand form was UB per
    // C11 7.13.1.1)
    Py_BEGIN_ALLOW_THREADS
    if (setjmp(png_jmpbuf(png))) {
        ok = 0;
    } else {
        png_init_io(png, f);
        png_read_info(png, info);

        w = png_get_image_width(png, info);
        h = png_get_image_height(png, info);
        int bit_depth = png_get_bit_depth(png, info);
        int color_type = png_get_color_type(png, info);

        // 16-bit grayscale keeps its depth: PIL opens it as mode 'I' and
        // convert('L') CLIPS at 255 (not high-byte truncation), so
        // strip_16 would silently diverge from the PIL fallback.
        // Everything else normalizes to 8-bit RGB or gray.
        bool gray16 =
            (bit_depth == 16 && color_type == PNG_COLOR_TYPE_GRAY);
        if (!gray16) png_set_strip_16(png);
        png_set_packing(png);
        png_set_expand(png);      // palette -> RGB, gray<8 -> 8
        png_set_strip_alpha(png);
        // returns the pass count (7 for Adam7); png_read_image then
        // de-interlaces correctly — per-row reads would scramble
        // interlaced files
        png_set_interlace_handling(png);
        png_read_update_info(png, info);

        int channels = png_get_channels(png, info);
        size_t rowbytes = png_get_rowbytes(png, info);
        img.resize(rowbytes * h);
        rows.resize(h);
        for (png_uint_32 y = 0; y < h; ++y)
            rows[y] = img.data() + static_cast<size_t>(y) * rowbytes;
        png_read_image(png, rows.data());
        png_read_end(png, nullptr);

        out.resize(static_cast<size_t>(w) * h);
        for (png_uint_32 y = 0; y < h; ++y) {
            const unsigned char* src = rows[y];
            unsigned char* dst = &out[static_cast<size_t>(y) * w];
            if (gray16) {
                for (png_uint_32 x = 0; x < w; ++x) {
                    // PNG stores 16-bit big-endian; clip like PIL 'I'->'L'
                    unsigned v = (static_cast<unsigned>(src[2 * x]) << 8)
                                 | src[2 * x + 1];
                    dst[x] = v > 255u ? 255u
                                      : static_cast<unsigned char>(v);
                }
            } else if (channels == 1) {
                std::memcpy(dst, src, w);
            } else {  // 3 channels after transforms
                for (png_uint_32 x = 0; x < w; ++x)
                    dst[x] = luma(src[3 * x], src[3 * x + 1],
                                  src[3 * x + 2]);
            }
        }
    }
    Py_END_ALLOW_THREADS
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    if (!ok) {
        PyErr_Format(PyExc_ValueError, "invalid PNG: %s", path);
        return nullptr;
    }

    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size()));
    if (!bytes) return nullptr;
    return Py_BuildValue("IIN", w, h, bytes);
}

PyObject* write_grayscale_png(PyObject*, PyObject* args) {
    const char* path;
    unsigned int w, h;
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "sIIy*", &path, &w, &h, &buf))
        return nullptr;
    if (static_cast<size_t>(buf.len) != static_cast<size_t>(w) * h) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer size != w*h");
        return nullptr;
    }
    FILE* f = std::fopen(path, "wb");
    if (!f) {
        PyBuffer_Release(&buf);
        PyErr_Format(PyExc_OSError, "cannot open %s for writing", path);
        return nullptr;
    }
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
        if (png) png_destroy_write_struct(&png, &info);
        std::fclose(f);
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_RuntimeError, "png write failed");
        return nullptr;
    }
    int ok = 1;
    Py_BEGIN_ALLOW_THREADS
    if (setjmp(png_jmpbuf(png))) {
        ok = 0;
    } else {
        png_init_io(png, f);
        png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_GRAY,
                     PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                     PNG_FILTER_TYPE_DEFAULT);
        png_write_info(png, info);
        const unsigned char* data =
            static_cast<const unsigned char*>(buf.buf);
        for (unsigned int y = 0; y < h; ++y)
            png_write_row(png, const_cast<png_bytep>(
                &data[static_cast<size_t>(y) * w]));
        png_write_end(png, nullptr);
    }
    Py_END_ALLOW_THREADS
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    PyBuffer_Release(&buf);
    if (!ok) {
        PyErr_SetString(PyExc_RuntimeError, "png write failed");
        return nullptr;
    }
    Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"read_grayscale_png", read_grayscale_png, METH_VARARGS,
     "read_grayscale_png(path) -> (w, h, bytes)"},
    {"write_grayscale_png", write_grayscale_png, METH_VARARGS,
     "write_grayscale_png(path, w, h, bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_ofot_io",
    "native grayscale PNG I/O (libpng)", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__ofot_io(void) {
    return PyModule_Create(&moduledef);
}
