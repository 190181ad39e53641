// color_flow — Middlebury optical-flow color visualizer (TPU-framework
// native tool).  Fresh C++ implementation of the behavior of the
// reference's prebuilt bin/color_flow ELF (SURVEY.md §2 C13):
//
//   usage: color_flow [-quiet] in.flo out.png [maxmotion]
//
// Reads a Middlebury .flo file (float32 tag 202021.25, int32 w, h, then
// h*w*2 float32 interleaved u,v), validates tag and dimensions with the
// same diagnostics, normalizes by the maximum motion radius over known
// pixels (or by the explicit [maxmotion] argument), maps each vector
// through the 55-entry color wheel (RY=15, YG=6, GC=4, CB=11, BM=13, MR=6),
// and writes the RGB image in the format chosen by the output extension —
// the same codec set the reference ELF embeds (its imageLib carries
// PNG/PGM/TGA writers; strings in reference bin/color_flow):
//   .png        — via libpng
//   .pgm / .ppm — binary PNM; RGB data writes P6 regardless of which of
//                 the two extensions is used (imageLib WriteFilePNM picks
//                 P5/P6 by band count, not extension)
//   .tga        — uncompressed 24-bit type-2 TARGA, BGR, bottom-up origin
// Unknown flow (|u| or |v| > 1e9) renders black.
//
// Build: make -C ofot_tpu/native      (requires libpng; zlib fallback none)

#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <vector>

#include <png.h>

namespace {

constexpr float kFloTag = 202021.25f;
constexpr double kUnknownThresh = 1e9;

// reference unknown_flow(): NaN counts as unknown (its disassembly carries
// an explicit NaN parity test); without it a NaN .flo pixel flowed into
// map(), static_cast<int>(NaN) was UB and the wheel lookup segfaulted
// (reproduced; review, round 4)
bool unknown_flow(double u, double v) {
    return std::isnan(u) || std::isnan(v) ||
           std::fabs(u) > kUnknownThresh || std::fabs(v) > kUnknownThresh;
}

[[noreturn]] void fail(const char* fmt, const char* arg = nullptr, int num = 0) {
    char buf[1024];
    std::snprintf(buf, sizeof buf, fmt, arg, num);
    std::fprintf(stderr, "%s\n", buf);
    std::exit(1);
}

struct Flow {
    int width = 0, height = 0;
    std::vector<float> u, v;   // row-major, h*w each
};

Flow read_flo(const char* path) {
    const char* dot = std::strrchr(path, '.');
    if (!dot || std::strcmp(dot, ".flo") != 0)
        fail("ReadFlowFile (%s): extension .flo expected", path);
    std::FILE* f = std::fopen(path, "rb");
    if (!f) fail("ReadFlowFile: could not open %s", path);

    float tag;
    std::int32_t w, h;
    if (std::fread(&tag, sizeof tag, 1, f) != 1 ||
        std::fread(&w, sizeof w, 1, f) != 1 ||
        std::fread(&h, sizeof h, 1, f) != 1)
        fail("ReadFlowFile: problem reading file %s", path);
    if (tag != kFloTag)
        fail("ReadFlowFile(%s): wrong tag (possibly due to big-endian machine?)", path);
    if (w < 1 || w > 99999)
        fail("ReadFlowFile(%s): illegal width %d", path, w);
    if (h < 1 || h > 99999)
        fail("ReadFlowFile(%s): illegal height %d", path, h);

    Flow flow;
    flow.width = w;
    flow.height = h;
    flow.u.resize(static_cast<size_t>(w) * h);
    flow.v.resize(static_cast<size_t>(w) * h);
    std::vector<float> row(static_cast<size_t>(w) * 2);
    for (int y = 0; y < h; ++y) {
        if (std::fread(row.data(), sizeof(float), row.size(), f) != row.size())
            fail("ReadFlowFile: problem reading file %s", path);
        for (int x = 0; x < w; ++x) {
            flow.u[static_cast<size_t>(y) * w + x] = row[2 * x];
            flow.v[static_cast<size_t>(y) * w + x] = row[2 * x + 1];
        }
    }
    std::fclose(f);
    return flow;
}

// ---- color wheel ---------------------------------------------------------

class ColorWheel {
  public:
    ColorWheel() {
        int k = 0;
        auto seg = [&](int n, auto rgb_of) {
            for (int i = 0; i < n; ++i, ++k) {
                auto c = rgb_of(i);
                wheel_[k][0] = c[0];
                wheel_[k][1] = c[1];
                wheel_[k][2] = c[2];
            }
        };
        const int RY = 15, YG = 6, GC = 4, CB = 11, BM = 13, MR = 6;
        seg(RY, [&](int i) { return std::array<int, 3>{255, 255 * i / RY, 0}; });
        seg(YG, [&](int i) { return std::array<int, 3>{255 - 255 * i / YG, 255, 0}; });
        seg(GC, [&](int i) { return std::array<int, 3>{0, 255, 255 * i / GC}; });
        seg(CB, [&](int i) { return std::array<int, 3>{0, 255 - 255 * i / CB, 255}; });
        seg(BM, [&](int i) { return std::array<int, 3>{255 * i / BM, 0, 255}; });
        seg(MR, [&](int i) { return std::array<int, 3>{255, 0, 255 - 255 * i / MR}; });
    }

    // (u, v) already normalized to the unit disc for in-range motion.
    // Single precision throughout: the reference computeColor works in
    // float (atan2f/sqrtss in its disassembly), and boundary pixels can
    // land on different wheel entries under double (review, round 4)
    void map(double ud, double vd, std::uint8_t* out) const {
        float u = static_cast<float>(ud), v = static_cast<float>(vd);
        float rad = std::sqrt(u * u + v * v);
        float a = std::atan2(-v, -u) / static_cast<float>(M_PI);
        float fk = (a + 1.0f) / 2.0f * (kN - 1);
        int k0 = static_cast<int>(fk);
        int k1 = (k0 + 1) % kN;
        float f = fk - k0;
        for (int b = 0; b < 3; ++b) {
            float col0 = wheel_[k0][b] / 255.0f;
            float col1 = wheel_[k1][b] / 255.0f;
            float col = (1.0f - f) * col0 + f * col1;
            if (rad <= 1.0f)
                col = 1.0f - rad * (1.0f - col);  // desaturate toward white
            else
                col *= 0.75f;                     // out of range: dim
            out[b] = static_cast<std::uint8_t>(255.0f * col);
        }
    }

  private:
    static constexpr int kN = 15 + 6 + 4 + 11 + 13 + 6;  // 55
    int wheel_[kN][3] = {};
};

void write_png(const char* path, int w, int h,
               const std::vector<std::uint8_t>& rgb) {
    std::FILE* f = std::fopen(path, "wb");
    if (!f) fail("WriteFilePNG: could not open %s", path);
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) fail("WriteFilePNG: error creating png structure");
    if (setjmp(png_jmpbuf(png))) fail("WriteFilePNG: error writing %s", path);
    png_init_io(png, f);
    png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    for (int y = 0; y < h; ++y)
        png_write_row(png, const_cast<png_bytep>(&rgb[static_cast<size_t>(y) * w * 3]));
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
}

void write_ppm(const char* path, int w, int h,
               const std::vector<std::uint8_t>& rgb) {
    // binary P6 for the 3-band color image (the reference imageLib's
    // WriteFilePPM path; its WriteFilePGM REJECTS 3-band data — see
    // write_image — so .pgm is not a P6 alias here; review, round 4)
    std::FILE* f = std::fopen(path, "wb");
    if (!f) fail("WriteFilePPM: could not open %s", path);
    std::fprintf(f, "P6\n%d %d\n255\n", w, h);
    if (std::fwrite(rgb.data(), 1, rgb.size(), f) != rgb.size())
        fail("WriteFilePPM: error writing %s", path);
    std::fclose(f);
}

void write_tga(const char* path, int w, int h,
               const std::vector<std::uint8_t>& rgb) {
    // uncompressed 24-bit type-2 TARGA; pixel order BGR.  Rows are
    // written TOP-DOWN with descriptor byte 0, exactly like the
    // reference's WriteFileTGA (its row loop fwrites y = 0..h-1 —
    // parity over spec-conformance; review, round 4)
    if (w > 0xFFFF || h > 0xFFFF)
        fail("WriteFileTGA: image too large for TGA header (%s, max 65535)",
             path);
    std::FILE* f = std::fopen(path, "wb");
    if (!f) fail("WriteFileTGA: could not open %s", path);
    std::uint8_t header[18] = {};
    header[2] = 2;                                    // uncompressed RGB
    header[12] = static_cast<std::uint8_t>(w & 0xFF);
    header[13] = static_cast<std::uint8_t>((w >> 8) & 0xFF);
    header[14] = static_cast<std::uint8_t>(h & 0xFF);
    header[15] = static_cast<std::uint8_t>((h >> 8) & 0xFF);
    header[16] = 24;                                  // bits per pixel
    if (std::fwrite(header, 1, sizeof header, f) != sizeof header)
        fail("WriteFileTGA: error writing %s", path);
    std::vector<std::uint8_t> row(static_cast<size_t>(w) * 3);
    for (int y = 0; y < h; ++y) {                     // top-down (parity)
        const std::uint8_t* src = &rgb[static_cast<size_t>(y) * w * 3];
        for (int x = 0; x < w; ++x) {
            row[3 * x] = src[3 * x + 2];              // B
            row[3 * x + 1] = src[3 * x + 1];          // G
            row[3 * x + 2] = src[3 * x];              // R
        }
        if (std::fwrite(row.data(), 1, row.size(), f) != row.size())
            fail("WriteFileTGA: error writing %s", path);
    }
    std::fclose(f);
}

void write_image(const char* path, int w, int h,
                 const std::vector<std::uint8_t>& rgb) {
    // dispatch mirrors the reference WriteImage: lowercase AND uppercase
    // .png/.tga, .ppm for the 3-band image; .pgm errors (1-band only in
    // imageLib's WriteFilePGM) and .pnm is not a supported type
    const char* dot = std::strrchr(path, '.');
    const char* ext = dot ? dot + 1 : "";
    if (std::strcmp(ext, "ppm") == 0)
        write_ppm(path, w, h, rgb);
    else if (std::strcmp(ext, "pgm") == 0)
        fail("WriteFilePGM(%s): can only write 1-band image as pgm", path);
    else if (std::strcmp(ext, "pnm") == 0)
        fail("WriteImage(%s): file type not supported", path);
    else if (std::strcmp(ext, "tga") == 0 || std::strcmp(ext, "TGA") == 0)
        write_tga(path, w, h, rgb);
    else if (std::strcmp(ext, "png") == 0 || std::strcmp(ext, "PNG") == 0)
        write_png(path, w, h, rgb);
    else
        fail("WriteImage: unknown image extension in %s "
             "(supported: png, ppm, tga)", path);
}

}  // namespace

int main(int argc, char** argv) {
    bool quiet = false;
    int argi = 1;
    if (argi < argc && std::strcmp(argv[argi], "-quiet") == 0) {
        quiet = true;
        ++argi;
    }
    if (argc - argi < 2 || argc - argi > 3) {
        std::fprintf(stderr, "  usage: %s [-quiet] in.flo out.png [maxmotion]\n",
                     argv[0]);
        return 1;
    }
    const char* in_path = argv[argi];
    const char* out_path = argv[argi + 1];
    double maxmotion = (argc - argi == 3) ? std::atof(argv[argi + 2]) : 0.0;

    Flow flow = read_flo(in_path);
    const int w = flow.width, h = flow.height;

    // motion statistics over known pixels
    double maxu = -999, maxv = -999, minu = 999, minv = 999, maxrad = -1;
    for (size_t i = 0; i < flow.u.size(); ++i) {
        double u = flow.u[i], v = flow.v[i];
        if (unknown_flow(u, v))
            continue;
        maxu = std::max(maxu, u); minu = std::min(minu, u);
        maxv = std::max(maxv, v); minv = std::min(minv, v);
        maxrad = std::max(maxrad, std::sqrt(u * u + v * v));
    }
    if (!quiet)
        std::printf("max motion: %.4f  motion range: u = %.3f .. %.3f;  "
                    "v = %.3f .. %.3f\n", maxrad, minu, maxu, minv, maxv);
    if (maxmotion > 0) maxrad = maxmotion;
    if (maxrad == 0) maxrad = 1;   // if flow == 0 everywhere

    ColorWheel wheel;
    std::vector<std::uint8_t> rgb(static_cast<size_t>(w) * h * 3, 0);
    for (size_t i = 0; i < flow.u.size(); ++i) {
        double u = flow.u[i], v = flow.v[i];
        if (unknown_flow(u, v))
            continue;   // unknown flow stays black
        wheel.map(u / maxrad, v / maxrad, &rgb[i * 3]);
    }
    if (!quiet)
        std::fprintf(stderr, "Writing image %s\n", out_path);
    write_image(out_path, w, h, rgb);
    return 0;
}
