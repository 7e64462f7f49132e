// Golden-output harness around the REFERENCE math core (VERDICT round-2 item 1).
//
// Compiles /root/reference/src/processing/magnification/{SpatialFilter,TemporalFilter,
// RieszPyramid}.cpp + MagnifyCore.hpp (unmodified, in place) against system OpenCV and
// exposes the full per-frame chain — PreprocessProcessor.cpp:10-51 semantics (normalized
// ROI crop, clamped, >=1px; INTER_AREA downscale), GrayscaleProcessor.cpp:7-16, the
// MagnificationProcessor.cpp:31-43 level clamp + warmup-passthrough — as a raw-frame
// stdin->stdout filter, so pytest can assert the JAX chain against the ACTUAL reference
// C++ outputs instead of the self-authored Python oracle.
//
// Protocol:
//   argv: mode fps levels amplification co_wavelength co_low co_high chrom
//         roi_enabled roi_x roi_y roi_w roi_h downscale grayscale w h t
//         [change_at change_low change_high]
//   stdin:  t frames of h*w*3 u8 BGR
//   stdout: 12-byte header (int32 out_h, out_w, out_c) then t frames of out u8 data.
//           Warmup frames (magnify* returns false) emit the post-preprocess input,
//           exactly like MagnificationProcessor.cpp:61.
//   The optional trailing triple switches coLow/coHigh at frame `change_at`,
//   driving the live cutoff-change path (Butterworth recompute + filter reset +
//   prior-pyramid rebuild, MagnifyCore.hpp:243-254 / the iir blend change for
//   laplace) exactly as the GUI would.
// Build: tools/build_ref_harness.sh

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

#include "processing/IProcessor.hpp"
#include "processing/magnification/MagnifyCore.hpp"
#include "processing/magnification/SpatialFilter.hpp"

using namespace livim;

static bool read_exact(void* dst, size_t n) {
    return std::fread(dst, 1, n, stdin) == n;
}

int main(int argc, char** argv) {
    if (argc != 19 && argc != 22) {
        std::fprintf(stderr,
                     "usage: %s mode fps levels amp co_wavelength co_low co_high chrom "
                     "roi_enabled roi_x roi_y roi_w roi_h downscale grayscale w h t "
                     "[change_at change_low change_high]\n",
                     argv[0]);
        return 2;
    }
    int a = 1;
    const std::string mode = argv[a++];
    MagnificationParams p;
    p.mode = mode == "laplace"  ? MagnificationMode::Laplace
             : mode == "color"  ? MagnificationMode::Color
             : mode == "phase"  ? MagnificationMode::Phase
                                : MagnificationMode::None;
    p.framerate = std::atof(argv[a++]);
    p.levels = std::atoi(argv[a++]);
    p.amplification = std::atof(argv[a++]);
    p.coWavelength = std::atof(argv[a++]);
    p.coLow = std::atof(argv[a++]);
    p.coHigh = std::atof(argv[a++]);
    p.chromAttenuation = std::atof(argv[a++]);

    PreprocessParams pre;
    pre.roiEnabled = std::atoi(argv[a++]) != 0;
    pre.roiX = static_cast<float>(std::atof(argv[a++]));
    pre.roiY = static_cast<float>(std::atof(argv[a++]));
    pre.roiW = static_cast<float>(std::atof(argv[a++]));
    pre.roiH = static_cast<float>(std::atof(argv[a++]));
    pre.downscale = std::atoi(argv[a++]);
    const bool grayscale = std::atoi(argv[a++]) != 0;
    const int w = std::atoi(argv[a++]);
    const int h = std::atoi(argv[a++]);
    const int t = std::atoi(argv[a++]);
    int change_at = -1;
    double change_low = 0.0, change_high = 0.0;
    if (argc == 22) {
        change_at = std::atoi(argv[a++]);
        change_low = std::atof(argv[a++]);
        change_high = std::atof(argv[a++]);
    }

    magcore::MotionState motion;
    magcore::ColorState color;
    magcore::RieszState riesz;

    std::vector<std::uint8_t> buf(static_cast<size_t>(h) * w * 3);
    bool wrote_header = false;

    for (int i = 0; i < t; ++i) {
        if (!read_exact(buf.data(), buf.size())) {
            std::fprintf(stderr, "short read at frame %d\n", i);
            return 3;
        }
        if (i == change_at) {  // live cutoff change, exactly as the GUI publishes it
            p.coLow = change_low;
            p.coHigh = change_high;
        }
        cv::Mat frame(h, w, CV_8UC3, buf.data());

        // --- Preprocess (PreprocessProcessor.cpp:10-51) ---
        const int divisor = std::clamp(pre.downscale, 1, 8);
        cv::Mat stage = frame;
        if (pre.roiEnabled || divisor > 1) {
            cv::Rect roi(0, 0, frame.cols, frame.rows);
            if (pre.roiEnabled) {
                int x = static_cast<int>(std::lround(double(pre.roiX) * frame.cols));
                int y = static_cast<int>(std::lround(double(pre.roiY) * frame.rows));
                int rw = static_cast<int>(std::lround(double(pre.roiW) * frame.cols));
                int rh = static_cast<int>(std::lround(double(pre.roiH) * frame.rows));
                x = std::clamp(x, 0, frame.cols - 1);
                y = std::clamp(y, 0, frame.rows - 1);
                rw = std::clamp(rw, 1, frame.cols - x);
                rh = std::clamp(rh, 1, frame.rows - y);
                roi = cv::Rect(x, y, rw, rh);
            }
            cv::Mat cropped = frame(roi);
            if (divisor > 1) {
                const int dw = std::max(1, cropped.cols / divisor);
                const int dh = std::max(1, cropped.rows / divisor);
                cv::resize(cropped, stage, cv::Size(dw, dh), 0, 0, cv::INTER_AREA);
            } else {
                cropped.copyTo(stage);
            }
        }

        // --- Grayscale (GrayscaleProcessor.cpp:7-16) ---
        if (grayscale && stage.channels() == 3) {
            cv::Mat gray;
            cv::cvtColor(stage, gray, cv::COLOR_BGR2GRAY);
            stage = gray;
        }

        // --- Magnification (MagnificationProcessor.cpp:31-61) ---
        cv::Mat out = stage;
        if (p.mode != MagnificationMode::None) {
            const int maxLevels = calculateMaxLevels(stage.size());
            if (maxLevels >= 1) {
                const int levels = std::clamp(p.levels, 1, maxLevels);
                const int channels = stage.channels();
                cv::Mat out8u;
                PixelFormat fmt = PixelFormat::BGR8;
                bool produced = false;
                switch (p.mode) {
                case MagnificationMode::Laplace:
                    produced = magcore::magnifyMotion(stage, p, levels, channels, motion,
                                                      out8u, fmt);
                    break;
                case MagnificationMode::Color:
                    produced = magcore::magnifyColor(stage, p, levels, channels, color,
                                                     out8u, fmt);
                    break;
                case MagnificationMode::Phase:
                    produced = magcore::magnifyRiesz(stage, p, levels, channels, riesz,
                                                     out8u, fmt);
                    break;
                default:
                    break;
                }
                if (produced) out = out8u;
            }
        }

        if (!wrote_header) {
            std::int32_t hdr[3] = {out.rows, out.cols, out.channels()};
            std::fwrite(hdr, sizeof(hdr), 1, stdout);
            wrote_header = true;
        }
        if (!out.isContinuous()) out = out.clone();
        std::fwrite(out.data, 1, size_t(out.rows) * out.cols * out.channels(), stdout);
    }
    std::fflush(stdout);
    return 0;
}
