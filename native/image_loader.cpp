// Native threaded image loader: PNG (libpng, 8/16-bit) + JPEG (libjpeg),
// decoded on a std::thread pool into premultiplied-linear float32 RGBA.
//
// TPU-native counterpart of the reference's multi-threaded C++ loader
// (reference src/nerf_loader.cu:197-760 load_nerf: stb_image decode on a
// thread pool + from_rgba32/srgb_to_linear conversion kernels,
// include/.../thread_pool.h).  Same output contract as the Python fallback
// (neus2_tpu/data/dataset.py::_load_image_rgba): decode -> [0,1] floats ->
// sRGB->linear on RGB -> premultiply by alpha -> (H, W, 4) float32.
//
// Exposed via ctypes (no pybind11 in the image); see neus2_tpu/native.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
    int width = 0;
    int height = 0;
    std::vector<float> rgba;  // H*W*4 premultiplied-linear
    std::string error;        // empty = ok
};

struct Batch {
    std::vector<Image> images;
};

inline float srgb_to_linear(float c) {
    // Matches dataset.py::_srgb_to_linear_np and the reference's
    // srgb_to_linear (common_device.cuh).
    return c <= 0.04045f ? c / 12.92f
                         : std::pow((c + 0.055f) / 1.055f, 2.4f);
}

// Convert interleaved RGBA samples (max_val-scaled integers) to the output
// contract. Lookup table: 8-bit has 256 levels, 16-bit 65536 — a table is
// exact and avoids 4M pow() calls per 1-megapixel image.
template <typename T>
void convert_rgba(const T* src, int w, int h, float max_val, Image& out) {
    int levels = static_cast<int>(max_val) + 1;
    std::vector<float> lin(levels), flat(levels);
    for (int i = 0; i < levels; ++i) {
        float f = static_cast<float>(i) / max_val;
        flat[i] = f;
        lin[i] = srgb_to_linear(f);
    }
    out.rgba.resize(static_cast<size_t>(w) * h * 4);
    const size_t n = static_cast<size_t>(w) * h;
    for (size_t p = 0; p < n; ++p) {
        float a = flat[src[p * 4 + 3]];
        out.rgba[p * 4 + 0] = lin[src[p * 4 + 0]] * a;
        out.rgba[p * 4 + 1] = lin[src[p * 4 + 1]] * a;
        out.rgba[p * 4 + 2] = lin[src[p * 4 + 2]] * a;
        out.rgba[p * 4 + 3] = a;
    }
    out.width = w;
    out.height = h;
}

struct PngErr {
    std::jmp_buf jb;
    std::string msg;
};

void png_error_fn(png_structp png, png_const_charp msg) {
    auto* e = static_cast<PngErr*>(png_get_error_ptr(png));
    e->msg = msg ? msg : "png error";
    std::longjmp(e->jb, 1);
}

void png_warn_fn(png_structp, png_const_charp) {}

void decode_png(FILE* f, Image& out) {
    PngErr err;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, &err,
                                             png_error_fn, png_warn_fn);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
        out.error = "libpng init failed";
        if (png) png_destroy_read_struct(&png, &info, nullptr);
        return;
    }
    std::vector<png_bytep> rows;
    std::vector<uint8_t> data;
    if (setjmp(err.jb)) {
        out.error = err.msg;
        png_destroy_read_struct(&png, &info, nullptr);
        return;
    }
    png_init_io(png, f);
    png_read_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int depth = png_get_bit_depth(png, info);
    int color = png_get_color_type(png, info);

    // Normalize every layout to interleaved RGBA at the file's bit depth.
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_set_filler(png, depth == 16 ? 0xffff : 0xff, PNG_FILLER_AFTER);
    if (depth == 16) png_set_swap(png);  // PNG is big-endian on disk
    png_read_update_info(png, info);

    size_t stride = png_get_rowbytes(png, info);
    data.resize(stride * h);
    rows.resize(h);
    for (png_uint_32 y = 0; y < h; ++y) rows[y] = data.data() + y * stride;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);

    if (depth == 16) {
        convert_rgba(reinterpret_cast<const uint16_t*>(data.data()),
                     static_cast<int>(w), static_cast<int>(h), 65535.0f, out);
    } else {
        convert_rgba(data.data(), static_cast<int>(w), static_cast<int>(h),
                     255.0f, out);
    }
}

struct JpegErr {
    jpeg_error_mgr mgr;
    std::jmp_buf jb;
    char msg[JMSG_LENGTH_MAX] = {0};
};

void jpeg_error_exit(j_common_ptr cinfo) {
    auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
    (*cinfo->err->format_message)(cinfo, e->msg);
    std::longjmp(e->jb, 1);
}

void decode_jpeg(FILE* f, Image& out) {
    jpeg_decompress_struct cinfo;
    JpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = jpeg_error_exit;
    std::vector<uint8_t> data;
    if (setjmp(err.jb)) {
        out.error = err.msg[0] ? err.msg : "jpeg decode failed";
        jpeg_destroy_decompress(&cinfo);
        return;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width, h = cinfo.output_height;
    data.resize(static_cast<size_t>(w) * h * 4, 255);  // alpha = 255
    std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
    for (int y = 0; y < h; ++y) {
        uint8_t* rp = row.data();
        jpeg_read_scanlines(&cinfo, &rp, 1);
        uint8_t* dst = data.data() + static_cast<size_t>(y) * w * 4;
        for (int x = 0; x < w; ++x) {
            dst[x * 4 + 0] = row[x * 3 + 0];
            dst[x * 4 + 1] = row[x * 3 + 1];
            dst[x * 4 + 2] = row[x * 3 + 2];
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    convert_rgba(data.data(), w, h, 255.0f, out);
}

void decode_one(const char* path, Image& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        out.error = std::string("cannot open ") + path;
        return;
    }
    uint8_t magic[4] = {0};
    size_t got = std::fread(magic, 1, 4, f);
    std::rewind(f);
    if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P' && magic[2] == 'N' &&
        magic[3] == 'G') {
        decode_png(f, out);
    } else if (got >= 2 && magic[0] == 0xff && magic[1] == 0xd8) {
        decode_jpeg(f, out);
    } else {
        out.error = "unsupported format (not PNG/JPEG)";
    }
    std::fclose(f);
}

}  // namespace

extern "C" {

// Decode n image files in parallel (n_threads <= 0: hardware concurrency).
void* il_load_batch(const char** paths, int n, int n_threads) {
    auto* batch = new Batch();
    batch->images.resize(n);
    std::vector<std::string> owned(paths, paths + n);
    if (n_threads <= 0)
        n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n) n_threads = n;

    std::vector<std::thread> pool;
    std::atomic<int> next{0};
    for (int t = 0; t < n_threads; ++t) {
        pool.emplace_back([&]() {
            for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
                decode_one(owned[i].c_str(), batch->images[i]);
        });
    }
    for (auto& th : pool) th.join();
    return batch;
}

int il_width(void* b, int i) { return static_cast<Batch*>(b)->images[i].width; }
int il_height(void* b, int i) { return static_cast<Batch*>(b)->images[i].height; }
int il_ok(void* b, int i) {
    return static_cast<Batch*>(b)->images[i].error.empty() ? 1 : 0;
}
const char* il_error(void* b, int i) {
    return static_cast<Batch*>(b)->images[i].error.c_str();
}
void il_copy(void* b, int i, float* out) {
    const auto& im = static_cast<Batch*>(b)->images[i];
    std::memcpy(out, im.rgba.data(), im.rgba.size() * sizeof(float));
}
void il_free(void* b) { delete static_cast<Batch*>(b); }

}  // extern "C"
