// Native runtime for xslam_tpu: 16-bit PNG depth decoding, threaded frame
// prefetching, and fast ASCII PLY export.
//
// This is the TPU-native counterpart of the reference's native IO layer:
// depth loading via OpenCV imread (XKinectFusion/src/Dataset.cpp:3-11),
// point-cloud PLY export (Visualization/src/CPointCloud.cpp:41-67). The
// prefetcher overlaps disk+decode with device compute (the reference decodes
// synchronously on the render thread).
//
// C ABI, consumed from Python via ctypes (no pybind11 in this image).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- png16 io
// Reads a 16-bit grayscale PNG. Returns 0 on success and fills out params;
// caller frees *out with xs_free(). Non-16-bit or non-gray images are
// converted where possible (8-bit gray is widened).
int xs_read_png16(const char* path, uint16_t** out, int* width, int* height) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    unsigned char sig[8];
    if (fread(sig, 1, 8, fp) != 8 || png_sig_cmp(sig, 0, 8)) {
        fclose(fp);
        return -2;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -3;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int depth = png_get_bit_depth(png, info);
    int color = png_get_color_type(png, info);

    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA)
        png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (depth == 8) png_set_expand_16(png);
    if (depth == 16) png_set_swap(png);  // PNG is big-endian; we want LE
    png_read_update_info(png, info);

    auto* buf = static_cast<uint16_t*>(malloc(sizeof(uint16_t) * w * h));
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; ++y)
        rows[y] = reinterpret_cast<png_bytep>(buf + y * w);
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);

    *out = buf;
    *width = static_cast<int>(w);
    *height = static_cast<int>(h);
    return 0;
}

void xs_free(void* p) { free(p); }

// ---------------------------------------------------------- PLY fast write
// ASCII PLY with x y z nx ny nz properties, format-compatible with
// CPointCloud::exportPly (11 header lines).
int xs_write_ply(const char* path, const float* points, const float* normals,
                 int64_t n) {
    FILE* fp = fopen(path, "w");
    if (!fp) return -1;
    fprintf(fp,
            "ply\nformat ascii 1.0\ncomment Created by xslam_tpu\n"
            "element vertex %lld\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "end_header\n",
            static_cast<long long>(n));
    // chunked formatting into a reusable buffer: ~10x faster than Python
    std::string chunk;
    chunk.reserve(1 << 20);
    char line[160];
    for (int64_t i = 0; i < n; ++i) {
        const float* p = points + 3 * i;
        const float* q = normals + 3 * i;
        int len = snprintf(line, sizeof line, "%.6g %.6g %.6g %.6g %.6g %.6g\n",
                           p[0], p[1], p[2], q[0], q[1], q[2]);
        chunk.append(line, len);
        if (chunk.size() > (1 << 20) - 256) {
            fwrite(chunk.data(), 1, chunk.size(), fp);
            chunk.clear();
        }
    }
    fwrite(chunk.data(), 1, chunk.size(), fp);
    fclose(fp);
    return 0;
}

// ------------------------------------------------------------- prefetcher
// Background thread pool that decodes depth PNGs ahead of the consumer.
struct Frame {
    std::vector<uint16_t> data;
    int width = 0, height = 0, status = -1;
    bool ready = false;
};

struct Prefetcher {
    std::vector<std::string> paths;
    std::vector<Frame> frames;
    std::mutex mu;
    std::condition_variable cv;
    std::atomic<int64_t> next{0};
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};
    int64_t window;

    void work() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (stop.load() || i >= static_cast<int64_t>(paths.size())) return;
            uint16_t* buf = nullptr;
            int w = 0, h = 0;
            int st = xs_read_png16(paths[i].c_str(), &buf, &w, &h);
            {
                std::lock_guard<std::mutex> lk(mu);
                Frame& f = frames[i];
                f.status = st;
                if (st == 0) {
                    f.width = w;
                    f.height = h;
                    f.data.assign(buf, buf + static_cast<size_t>(w) * h);
                }
                f.ready = true;
            }
            if (buf) free(buf);
            cv.notify_all();
        }
    }
};

void* xs_prefetch_create(const char** paths, int64_t n, int n_threads) {
    auto* pf = new Prefetcher;
    pf->paths.assign(paths, paths + n);
    pf->frames.resize(n);
    int nt = n_threads > 0 ? n_threads : 2;
    for (int t = 0; t < nt; ++t) pf->workers.emplace_back([pf] { pf->work(); });
    return pf;
}

// Blocks until frame i is decoded; copies into dst (size w*h uint16) and
// returns 0, or a negative decode status.
int xs_prefetch_get(void* handle, int64_t i, uint16_t* dst, int* width,
                    int* height) {
    auto* pf = static_cast<Prefetcher*>(handle);
    std::unique_lock<std::mutex> lk(pf->mu);
    pf->cv.wait(lk, [&] { return pf->frames[i].ready; });
    Frame& f = pf->frames[i];
    if (f.status != 0) return f.status;
    *width = f.width;
    *height = f.height;
    if (dst) memcpy(dst, f.data.data(), f.data.size() * sizeof(uint16_t));
    f.data.clear();
    f.data.shrink_to_fit();
    return 0;
}

void xs_prefetch_destroy(void* handle) {
    auto* pf = static_cast<Prefetcher*>(handle);
    pf->stop.store(true);
    pf->next.store(1 << 30);
    for (auto& t : pf->workers) t.join();
    delete pf;
}

// ------------------------------------------------------------- pose txt io
// 7-digit fixed-precision 4x4 matrix write, matching IOHelper.cpp:4-33.
int xs_write_pose(const char* path, const float* mat4) {
    FILE* fp = fopen(path, "w");
    if (!fp) return -1;
    for (int r = 0; r < 4; ++r)
        fprintf(fp, "%.7f %.7f %.7f %.7f\n", mat4[4 * r], mat4[4 * r + 1],
                mat4[4 * r + 2], mat4[4 * r + 3]);
    fclose(fp);
    return 0;
}

}  // extern "C"
