// mimamo_native: multithreaded host-side video -> face-crop clip loader.
//
// Role: the reference pipeline's only native code was the external OpenFace
// C++ binary (face detect/align/crop, one process + one image file per
// frame) plus torch DataLoader worker processes (SURVEY.md §2, §3.3). This
// library replaces both with an in-process C++ pipeline: N worker threads
// decode videos (OpenCV VideoCapture), detect/track faces (Haar cascade
// re-detected every K frames, sparse-LK flow between detections — same
// policy and parameters as io/decode.py; use_lk=0 restores the
// reference's hold-last), square-expand + crop + bilinear-resize, and
// emit fixed-size
// [clip_len, crop, crop, 3] RGB uint8 clips into a bounded queue that the
// Python/JAX side drains and ships to the TPU. No disk round-trips, no
// GIL, no per-frame subprocess.
//
// C ABI (ctypes-friendly), see mimamo_tpu/io/native_loader.py for the
// Python wrapper and graceful fallback.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <sys/resource.h>
#include <sys/syscall.h>
#include <unistd.h>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/objdetect.hpp>
#include <opencv2/video.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct Clip {
  std::vector<uint8_t> data;  // [clip_len, crop, crop, 3] RGB
  int32_t video_idx = 0;
  int32_t start_frame = 0;
};

struct BoundedQueue {
  std::deque<Clip> q;
  std::mutex mu;
  std::condition_variable not_empty, not_full;
  size_t cap = 8;
  bool closed = false;

  void push(Clip&& c) {
    std::unique_lock<std::mutex> lk(mu);
    not_full.wait(lk, [&] { return q.size() < cap || closed; });
    if (closed) return;
    q.push_back(std::move(c));
    not_empty.notify_one();
  }
  bool pop(Clip* out) {
    std::unique_lock<std::mutex> lk(mu);
    not_empty.wait(lk, [&] { return !q.empty() || closed; });
    if (q.empty()) return false;
    *out = std::move(q.front());
    q.pop_front();
    not_full.notify_one();
    return true;
  }
  void close() {
    std::lock_guard<std::mutex> lk(mu);
    closed = true;
    not_empty.notify_all();
    not_full.notify_all();
  }
};

struct FaceTracker {
  cv::CascadeClassifier cascade;
  bool enabled = false;
  bool use_lk = true;  // LK flow between detections (io/decode.py
                       // parity); false = reference hold-last policy
  int detect_every = 8;
  float margin = 0.25f;
  cv::Rect2f last;
  bool has_last = false;
  bool held_from_detection = false;  // center-crop fallback must NOT
                                     // drive the adaptive downscale
  cv::Mat prev_gray;
  int prev_ds = 1;       // downscale factor prev_gray was built with
  // Current-frame gray plane + its downscale, shared with the eye
  // tracker's LK stage (refcounted cv::Mat header — no copy; empty on
  // frames where neither box LK nor detection needed gray).
  cv::Mat cur_gray;
  int cur_ds = 1;

  void reset() {
    has_last = false;
    held_from_detection = false;
    prev_gray.release();
    prev_ds = 1;
    cur_gray.release();
    cur_ds = 1;
  }

  // Median sparse-LK displacement of good features inside `box`
  // (same parameters as decode._lk_shift: 32 corners, quality 0.05,
  // min distance 5, 15x15 window, 2 pyramid levels, >= 4 survivors).
  // `ds`: the downscale factor `gray`/`prev_gray` were built with; the
  // box ROI maps into small coords and the shift maps back out.
  bool lk_shift(const cv::Mat& gray, int ds, float* dy, float* dx) const {
    const float s = 1.f / static_cast<float>(ds);
    cv::Rect roi(static_cast<int>(last.x * s),
                 static_cast<int>(last.y * s),
                 static_cast<int>(last.width * s),
                 static_cast<int>(last.height * s));
    roi &= cv::Rect(0, 0, prev_gray.cols, prev_gray.rows);
    if (roi.area() <= 0) return false;
    std::vector<cv::Point2f> pts;
    cv::goodFeaturesToTrack(prev_gray(roi), pts, 32, 0.05, 5);
    if (pts.size() < 4) return false;
    for (auto& p : pts) p += cv::Point2f(static_cast<float>(roi.x),
                                         static_cast<float>(roi.y));
    std::vector<cv::Point2f> nxt;
    std::vector<uchar> ok;
    std::vector<float> err;
    cv::calcOpticalFlowPyrLK(prev_gray, gray, pts, nxt, ok, err,
                             cv::Size(15, 15), 2);
    std::vector<float> dxs, dys;
    for (size_t i = 0; i < pts.size(); ++i) {
      if (ok[i]) {
        dxs.push_back(nxt[i].x - pts[i].x);
        dys.push_back(nxt[i].y - pts[i].y);
      }
    }
    if (dxs.size() < 4) return false;
    auto median = [](std::vector<float>& v) {
      // numpy-parity: even-length median averages the middle pair
      const size_t m = v.size() / 2;
      std::nth_element(v.begin(), v.begin() + m, v.end());
      float hi = v[m];
      if (v.size() % 2 == 0) {
        float lo = *std::max_element(v.begin(), v.begin() + m);
        return (lo + hi) / 2.f;
      }
      return hi;
    };
    *dx = median(dxs) * static_cast<float>(ds);
    *dy = median(dys) * static_cast<float>(ds);
    return true;
  }

  // Returns a square crop rect for this frame (detect / LK-track /
  // hold-last).
  cv::Rect2f box_for(const cv::Mat& rgb, int frame_idx) {
    const float h = static_cast<float>(rgb.rows);
    const float w = static_cast<float>(rgb.cols);
    const bool detect_now = enabled && frame_idx % detect_every == 0;
    // Adaptive downscaled-luma tracking (round 4): once a face is held,
    // re-detect and LK-track on a gray plane downscaled so the face
    // stays >= 48 px (2x the Haar cascade's 24x24 native window).
    // Haar cost scales ~linearly with pixels, so ds=2/4 cuts the
    // dominant per-frame cost ~4x/16x on large faces; small faces
    // (< 96 px) keep ds=1, i.e. full-res behavior — where precision
    // and recall actually matter. First detection (no held box) is
    // always full-res for recall.
    // Only a box that came from a real detection scales the luma down:
    // the no-detection center-crop fallback is frame-sized, and letting
    // it pick ds=4 would permanently blind re-detection to any face
    // smaller than 4x the cascade window.
    int ds = 1;
    if (has_last && held_from_detection) {
      const float side = std::min(last.width, last.height);
      while (ds < 4 && side / static_cast<float>(ds * 2) >= 48.f) ds *= 2;
    }
    cv::Mat gray;
    if (use_lk || detect_now) {
      cv::cvtColor(rgb, gray, cv::COLOR_RGB2GRAY);
      if (ds > 1)
        cv::resize(gray, gray, cv::Size(), 1.0 / ds, 1.0 / ds,
                   cv::INTER_AREA);
    }
    bool detected = false;
    if (detect_now) {
      std::vector<cv::Rect> found;
      // cv::Size is (width, height); use the min side for the floor.
      const int min_side = std::min(rgb.rows, rgb.cols) / (8 * ds);
      cascade.detectMultiScale(gray, found, 1.2, 4, 0,
                               cv::Size(min_side, min_side));
      if (!found.empty()) {
        const cv::Rect* best = &found[0];
        for (const auto& r : found)
          if (r.area() > best->area()) best = &r;
        const float f = static_cast<float>(ds);
        float side = std::max(best->width, best->height) * f
                     * (1.f + margin);
        float cy = (best->y + best->height / 2.f) * f;
        float cx = (best->x + best->width / 2.f) * f;
        float y0 = std::max(0.f, std::min(cy - side / 2.f, h - 1.f));
        float x0 = std::max(0.f, std::min(cx - side / 2.f, w - 1.f));
        side = std::min({side, h - y0, w - x0});
        last = cv::Rect2f(x0, y0, side, side);
        has_last = true;
        held_from_detection = true;
        detected = true;
      }
    }
    if (!has_last) {
      float side = std::min(h, w);
      last = cv::Rect2f((w - side) / 2.f, (h - side) / 2.f, side, side);
      has_last = true;
    } else if (use_lk && !detected && !prev_gray.empty()
               && prev_ds == ds) {
      // (ds changed between frames -> scales mismatch; hold this frame
      // and resume LK next frame. Transitions are rare: only when the
      // held box crosses a 96/192 px threshold.)
      float dy = 0.f, dx = 0.f;
      if (lk_shift(gray, ds, &dy, &dx)) {
        last.y = std::max(0.f, std::min(last.y + dy, h - last.height));
        last.x = std::max(0.f, std::min(last.x + dx, w - last.width));
      }
    }
    cur_gray = gray;   // header share for the eye tracker's LK stage
    cur_ds = ds;
    if (use_lk) {
      prev_gray = std::move(gray);
      prev_ds = ds;
    }
    return last;
  }
};

// Eye-landmark tracker mirroring mimamo_tpu/io/decode.py EyeTracker
// (ABI 9): Haar eye detection inside the upper half of the face box,
// SANITY-GATED (plausible interocular distance, roughly horizontal —
// rejects eyebrow/nostril false pairs), LK point flow between
// detections with an interocular-jump gate (use_lk; falls back to
// hold-last), canonical in-box positions when nothing was ever found.
// LK runs on the gray plane the face tracker already built — i.e. at
// its adaptive downscale (ds in {1, 2, 4}); ds > 1 only engages on
// >= 96 px faces where the sub-pixel loss is proportionally small
// (the python tracker runs full-res; parity tests use 64 px faces,
// which keep ds = 1). Output layout per frame: (left_y, left_x,
// right_y, right_x) in source pixels — the same contract as the
// precomputed <video>.landmarks.npy files, so a stronger external
// tracker can replace this stage without touching the pipeline.
struct EyeTracker {
  cv::CascadeClassifier cascade;
  bool enabled = false;
  bool use_lk = false;
  int detect_every = 8;
  float last[4];
  bool has_last = false;
  cv::Mat prev_gray;
  int prev_ds = 1;

  void reset() {
    has_last = false;
    prev_gray.release();
    prev_ds = 1;
  }

  // decode.EyeTracker._plausible: interocular distance 15-80% of the
  // box width and within 30 degrees of horizontal.
  static bool plausible(const float p[4], const cv::Rect2f& box) {
    const float dy = p[2] - p[0], dx = p[3] - p[1];
    const float dist = std::sqrt(dy * dy + dx * dx);
    return dist >= 0.15f * box.width && dist <= 0.8f * box.width &&
           std::fabs(dy) <= 0.5f * dist;
  }

  // decode.EyeTracker._detect: candidate pairs among the top-4
  // detections by area (largest area-sum first), first plausible wins.
  bool detect(const cv::Mat& rgb, const cv::Rect2f& box, float* out) {
    cv::Rect roi(static_cast<int>(box.x), static_cast<int>(box.y),
                 static_cast<int>(box.width),
                 static_cast<int>(box.height) / 2);
    roi &= cv::Rect(0, 0, rgb.cols, rgb.rows);
    if (roi.area() <= 0) return false;
    cv::Mat gray;
    cv::cvtColor(rgb(roi), gray, cv::COLOR_RGB2GRAY);
    std::vector<cv::Rect> found;
    cascade.detectMultiScale(gray, found, 1.1, 3);
    if (found.size() < 2) return false;
    std::sort(found.begin(), found.end(),
              [](const cv::Rect& a, const cv::Rect& b) {
                return a.area() > b.area();
              });
    if (found.size() > 4) found.resize(4);
    struct Pair { int a, b; long area; };
    std::vector<Pair> pairs;
    for (int a = 0; a < static_cast<int>(found.size()); ++a)
      for (int b = a + 1; b < static_cast<int>(found.size()); ++b)
        pairs.push_back({a, b, static_cast<long>(found[a].area())
                               + found[b].area()});
    std::stable_sort(pairs.begin(), pairs.end(),
                     [](const Pair& p, const Pair& q) {
                       return p.area > q.area;
                     });
    for (const auto& pr : pairs) {
      float y0 = found[pr.a].y + found[pr.a].height / 2.f + roi.y;
      float x0 = found[pr.a].x + found[pr.a].width / 2.f + roi.x;
      float y1 = found[pr.b].y + found[pr.b].height / 2.f + roi.y;
      float x1 = found[pr.b].x + found[pr.b].width / 2.f + roi.x;
      if (x0 > x1) {                      // order left-to-right by x
        std::swap(x0, x1);
        std::swap(y0, y1);
      }
      const float cand[4] = {y0, x0, y1, x1};
      if (plausible(cand, box)) {
        std::memcpy(out, cand, sizeof(cand));
        return true;
      }
    }
    return false;
  }

  // decode.EyeTracker._lk_points on the shared (downscaled) gray:
  // 21x21 window, 3 pyramid levels, both points must survive and the
  // interocular distance must stay within [0.8, 1.25]x.
  bool lk_points(const cv::Mat& gray, int ds, float* out) const {
    const float s = 1.f / static_cast<float>(ds);
    std::vector<cv::Point2f> p0 = {{last[1] * s, last[0] * s},
                                   {last[3] * s, last[2] * s}};
    std::vector<cv::Point2f> p1;
    std::vector<uchar> ok;
    std::vector<float> err;
    cv::calcOpticalFlowPyrLK(prev_gray, gray, p0, p1, ok, err,
                             cv::Size(21, 21), 3);
    if (ok.size() != 2 || !ok[0] || !ok[1]) return false;
    const float f = static_cast<float>(ds);
    const float cand[4] = {p1[0].y * f, p1[0].x * f,
                           p1[1].y * f, p1[1].x * f};
    const float d0y = last[2] - last[0], d0x = last[3] - last[1];
    const float d1y = cand[2] - cand[0], d1x = cand[3] - cand[1];
    const float d0 = std::sqrt(d0y * d0y + d0x * d0x);
    const float d1 = std::sqrt(d1y * d1y + d1x * d1x);
    if (d1 < 0.8f * d0 || d1 > 1.25f * d0) return false;
    // neither point may move more than half the interocular distance
    // in one frame (decode.EyeTracker._lk_points displacement gate)
    for (int k = 0; k < 2; ++k) {
      const float my = cand[2 * k] - last[2 * k];
      const float mx = cand[2 * k + 1] - last[2 * k + 1];
      if (std::sqrt(my * my + mx * mx) > 0.5f * d0) return false;
    }
    std::memcpy(out, cand, sizeof(cand));
    return true;
  }

  // `gray`/`ds`: the face tracker's current-frame luma plane (may be
  // empty on frames where it computed none — then LK holds).
  void eyes_for(const cv::Mat& rgb, const cv::Rect2f& box, int frame_idx,
                const cv::Mat& gray, int ds, float* out) {
    bool detected = false;
    if (enabled && frame_idx % detect_every == 0) {
      float cand[4];
      if (detect(rgb, box, cand)) {
        std::memcpy(last, cand, sizeof(last));
        has_last = true;
        detected = true;
      }
    }
    if (use_lk && !detected && has_last && !prev_gray.empty() &&
        !gray.empty() && prev_ds == ds) {
      float cand[4];
      if (lk_points(gray, ds, cand))
        std::memcpy(last, cand, sizeof(last));
    }
    if (use_lk && !gray.empty()) {
      prev_gray = gray;       // refcounted share of the tracker's plane
      prev_ds = ds;
    }
    if (has_last) {
      std::memcpy(out, last, sizeof(last));
    } else {                                // canonical in-box positions
      out[0] = box.y + 0.38f * box.height;
      out[1] = box.x + 0.22f * box.width;
      out[2] = box.y + 0.38f * box.height;
      out[3] = box.x + 0.78f * box.width;
    }
  }
};

// preprocess.similarity_from_eyes parity: inverse-map similarity from
// one eye pair ((ly, lx, ry, rx) source pixels), expressed as a
// cv::warpAffine matrix (WARP_INVERSE_MAP, (x, y) column order) with
// the python path's pixel-CENTER sampling convention folded into the
// translation (warp_similarity samples src = A @ (dst + 0.5) - 0.5).
cv::Mat eye_align_matrix(const float eyes[4], int out_size,
                         double eye_y = 0.38, double eye_dx = 0.28) {
  const double ly = eyes[0], lx = eyes[1], ry = eyes[2], rx = eyes[3];
  const double dly = eye_y * out_size, dlx = (0.5 - eye_dx) * out_size;
  const double drx = (0.5 + eye_dx) * out_size;
  const double dvy = 0.0, dvx = drx - dlx;   // canonical eyes level
  const double svy = ry - ly, svx = rx - lx;
  const double denom = dvy * dvy + dvx * dvx;
  const double a = (svy * dvy + svx * dvx) / denom;
  const double b = (svx * dvy - svy * dvx) / denom;
  // A in (y, x): src_y = a*y - b*x + ty ; src_x = b*y + a*x + tx
  const double ty = ly - (a * dly - b * dlx);
  const double tx = lx - (b * dly + a * dlx);
  const double ty_c = ty + (a * 0.5 - b * 0.5) - 0.5;
  const double tx_c = tx + (b * 0.5 + a * 0.5) - 0.5;
  cv::Mat m(2, 3, CV_64F);
  m.at<double>(0, 0) = a;
  m.at<double>(0, 1) = b;
  m.at<double>(0, 2) = tx_c;
  m.at<double>(1, 0) = -b;
  m.at<double>(1, 1) = a;
  m.at<double>(1, 2) = ty_c;
  return m;
}

void align_into(const cv::Mat& rgb, const float eyes[4], int crop,
                uint8_t* dst) {
  cv::Mat out(crop, crop, CV_8UC3, dst);
  cv::warpAffine(rgb, out, eye_align_matrix(eyes, crop),
                 out.size(), cv::INTER_LINEAR | cv::WARP_INVERSE_MAP,
                 cv::BORDER_REPLICATE);
}

void crop_resize_into(const cv::Mat& rgb, const cv::Rect2f& box, int crop,
                      uint8_t* dst) {
  cv::Rect r(static_cast<int>(box.x), static_cast<int>(box.y),
             static_cast<int>(box.width), static_cast<int>(box.height));
  r &= cv::Rect(0, 0, rgb.cols, rgb.rows);
  if (r.width < 1 || r.height < 1) r = cv::Rect(0, 0, rgb.cols, rgb.rows);
  cv::Mat out(crop, crop, CV_8UC3, dst);
  cv::resize(rgb(r), out, out.size(), 0, 0, cv::INTER_LINEAR);
}

struct Corpus {
  std::vector<std::string> paths;
  int clip_len, stride, crop, detect_every;
  bool use_lk = true;
  bool align = false;            // similarity-align via eye landmarks
  std::string cascade_path;
  std::string eye_cascade_path;
  BoundedQueue queue;
  std::vector<std::thread> workers;
  std::atomic<int> next_video{0};
  std::atomic<int> active_workers{0};
  std::atomic<long> frames_decoded{0};

  void worker() {
    // Decode is the background producer: run it at minimum scheduling
    // priority (per-thread nice 19) so the consumer — in production the
    // accelerator client's RPC/serialization threads — preempts it.
    // Measured on the 1-core bench host: full-priority decode inflated
    // the TPU-tunnel execution round-trip ~20x during corpus runs
    // (BASELINE.md round-4 e2e row).
    setpriority(PRIO_PROCESS, static_cast<id_t>(syscall(SYS_gettid)), 19);
    FaceTracker tracker;
    if (!cascade_path.empty() && tracker.cascade.load(cascade_path))
      tracker.enabled = true;
    tracker.detect_every = detect_every;
    tracker.use_lk = use_lk;
    EyeTracker eyes;
    if (align && !eye_cascade_path.empty() &&
        eyes.cascade.load(eye_cascade_path))
      eyes.enabled = true;
    eyes.detect_every = detect_every;
    eyes.use_lk = use_lk;   // one policy knob for boxes AND eye points

    const size_t clip_bytes =
        static_cast<size_t>(clip_len) * crop * crop * 3;
    for (;;) {
      int vi = next_video.fetch_add(1);
      if (vi >= static_cast<int>(paths.size())) break;
      cv::VideoCapture cap(paths[vi]);
      if (!cap.isOpened()) {
        Clip fail;  // sentinel with start_frame = -1: decode failure
        fail.video_idx = ~vi;
        fail.start_frame = -1;
        queue.push(std::move(fail));
        continue;
      }
      tracker.reset();
      eyes.reset();

      // Sliding window over the decode stream: keep a rolling buffer of
      // the last clip_len cropped frames; emit at every stride.
      std::deque<std::vector<uint8_t>> window;
      cv::Mat bgr, rgb;
      int frame_idx = 0;
      int emitted_end = 0;  // frame index after the last emitted window
      while (cap.read(bgr)) {
        cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
        cv::Rect2f box = tracker.box_for(rgb, frame_idx);
        std::vector<uint8_t> cropped(static_cast<size_t>(crop) * crop * 3);
        if (align) {
          float eye_buf[4];
          eyes.eyes_for(rgb, box, frame_idx, tracker.cur_gray,
                        tracker.cur_ds, eye_buf);
          align_into(rgb, eye_buf, crop, cropped.data());
        } else {
          crop_resize_into(rgb, box, crop, cropped.data());
        }
        window.push_back(std::move(cropped));
        if (static_cast<int>(window.size()) > clip_len) window.pop_front();
        ++frame_idx;
        frames_decoded.fetch_add(1);
        bool boundary = (frame_idx >= clip_len) &&
                        ((frame_idx - clip_len) % stride == 0);
        if (boundary) {
          Clip c;
          c.data.resize(clip_bytes);
          size_t off = 0;
          for (const auto& f : window) {
            std::memcpy(c.data.data() + off, f.data(), f.size());
            off += f.size();
          }
          c.video_idx = vi;
          c.start_frame = frame_idx - clip_len;
          emitted_end = frame_idx;
          queue.push(std::move(c));
        }
      }
      // Right-aligned tail window so every frame is covered (matches
      // preprocess.sliding_windows).
      if (frame_idx >= clip_len && emitted_end < frame_idx) {
        Clip c;
        c.data.resize(clip_bytes);
        size_t off = 0;
        for (const auto& f : window) {
          std::memcpy(c.data.data() + off, f.data(), f.size());
          off += f.size();
        }
        c.video_idx = vi;
        c.start_frame = frame_idx - clip_len;
        queue.push(std::move(c));
      }
      // Short video (< clip_len frames): one clip padded by repeating
      // the last crop (static tail: ~zero phase diffs), start_frame 0;
      // the consumer trims outputs to the real frame count (matches
      // runner.predict_video's short-video policy).
      if (frame_idx > 0 && frame_idx < clip_len) {
        Clip c;
        c.data.resize(clip_bytes);
        size_t off = 0;
        for (const auto& f : window) {
          std::memcpy(c.data.data() + off, f.data(), f.size());
          off += f.size();
        }
        const auto& last = window.back();
        for (int k = frame_idx; k < clip_len; ++k) {
          std::memcpy(c.data.data() + off, last.data(), last.size());
          off += last.size();
        }
        c.video_idx = vi;
        c.start_frame = 0;
        queue.push(std::move(c));
      }
      // End-of-video sentinel (empty payload): video_idx = ~vi,
      // start_frame = total decoded frames. Lets the consumer finalize
      // per-video outputs incrementally (checkpointed corpus runs).
      Clip eov;
      eov.video_idx = ~vi;
      eov.start_frame = frame_idx;
      queue.push(std::move(eov));
    }
    if (active_workers.fetch_sub(1) == 1) queue.close();
  }
};

}  // namespace

extern "C" {

// Bumped whenever an exported signature changes; the ctypes wrapper
// refuses (and falls back to Python) on mismatch so a stale .so can
// never be called with the wrong ABI.
// 3: short-video padding (one last-crop-padded clip for videos
// with < clip_len frames) — a behavioral contract the Python
// consumer relies on, so stale builds must be refused.
// 4: ml_detect — per-frame Haar detection for the Python tracker
// (OpenCV 5 python wheels removed CascadeClassifier; this library is
// built against the system OpenCV 4, which still ships it).
// 5: LK flow tracking between detections (use_lk arg on
// ml_corpus_open / ml_decode_video; decode.py-parity parameters) —
// measured IoU 0.87-0.95 vs 0.74-0.94 for the old hold-last policy
// (bench/tracker_eval.py).
// 6: similarity-aligned crops on the bulk path (align + eye-cascade
// args; preprocess.similarity_from_eyes-parity warp incl. the
// pixel-center convention).
// 7: ml_detect returns detections sorted by area (descending), so a
// truncated result can never drop the largest face — the Python
// tracker keeps only max-area, and crowded frames easily exceed the
// caller's buffer (cv2-wheel parity: that path returns everything).
// 8: adaptive downscaled-luma tracking on the bulk path — once a face
// is held, Haar re-detect + LK run on gray downscaled so the face
// stays >= 48 px (ds in {1,2,4}; the first detect is always full
// res). Boxes can differ from full-res tracking on >= 96 px faces
// (IoU 0.90-0.92 vs the full-res python tracker, BASELINE.md
// 2026-08-17); 64 px faces keep ds=1, so behavior is exact where
// precision matters. Loader throughput +78-100%.
// 9: eye-landmark LK point flow between detections + detection sanity
// gate (plausible interocular distance, roughly horizontal, pair
// search over the top-4 candidates) — mirrors decode.EyeTracker
// (round-4 VERDICT directive 3). Eye landmarks on moving faces no
// longer hold-last between detections; measured gt-init envelope:
// eye error <= 0.3 px / warp error <= 1.3 crop px vs 12-40 px /
// 68-234 crop px for hold (bench/tracker_eval.py).
int ml_abi_version() { return 9; }

namespace {
// Loading a Haar XML costs ~10 ms; Python-side per-frame detection
// calls reuse the parsed classifier. One mutex guards both the map and
// the detect call: detectMultiScale is not thread-safe on a shared
// instance, and ctypes callers may arrive from multiple threads.
std::mutex g_cascade_mu;
std::map<std::string, cv::CascadeClassifier> g_cascades;
}  // namespace

// Haar detection on a caller-provided grayscale image (row-major,
// stride_bytes per row; pass 0 for tightly packed). Boxes are written
// as (y, x, h, w) float rows. Returns the number written (<= max_boxes),
// 0 when nothing is found, -1 when the cascade cannot be loaded.
int ml_detect(const uint8_t* gray, int h, int w, int stride_bytes,
              const char* cascade_xml, double scale_factor,
              int min_neighbors, int min_size, float* out_boxes,
              int max_boxes) {
  if (!gray || !cascade_xml || !*cascade_xml || h <= 0 || w <= 0 ||
      max_boxes <= 0)
    return -1;
  std::lock_guard<std::mutex> lk(g_cascade_mu);
  auto it = g_cascades.find(cascade_xml);
  if (it == g_cascades.end()) {
    cv::CascadeClassifier c;
    if (!c.load(cascade_xml)) return -1;
    it = g_cascades.emplace(cascade_xml, std::move(c)).first;
  }
  cv::Mat img(h, w, CV_8UC1, const_cast<uint8_t*>(gray),
              stride_bytes > 0 ? static_cast<size_t>(stride_bytes)
                               : static_cast<size_t>(w));
  std::vector<cv::Rect> found;
  it->second.detectMultiScale(img, found, scale_factor, min_neighbors, 0,
                              cv::Size(min_size, min_size));
  // Largest faces first: truncation at max_boxes must never discard
  // the max-area detection the caller is about to select (ABI 7).
  std::stable_sort(found.begin(), found.end(),
                   [](const cv::Rect& a, const cv::Rect& b) {
                     return a.area() > b.area();
                   });
  const int n = std::min<int>(static_cast<int>(found.size()), max_boxes);
  for (int i = 0; i < n; ++i) {
    out_boxes[4 * i + 0] = static_cast<float>(found[i].y);
    out_boxes[4 * i + 1] = static_cast<float>(found[i].x);
    out_boxes[4 * i + 2] = static_cast<float>(found[i].height);
    out_boxes[4 * i + 3] = static_cast<float>(found[i].width);
  }
  return n;
}

void* ml_corpus_open(const char** paths, int n_videos, int clip_len,
                     int stride, int crop, int queue_cap, int n_threads,
                     const char* cascade_xml, int detect_every,
                     int use_lk, const char* eye_cascade_xml,
                     int align) {
  if (n_videos <= 0 || clip_len <= 0 || stride <= 0 || crop <= 0)
    return nullptr;
  auto* c = new Corpus();
  c->paths.assign(paths, paths + n_videos);
  c->clip_len = clip_len;
  c->stride = stride;
  c->crop = crop;
  c->detect_every = detect_every > 0 ? detect_every : 8;
  c->use_lk = use_lk != 0;
  c->align = align != 0;
  c->cascade_path = cascade_xml ? cascade_xml : "";
  c->eye_cascade_path = eye_cascade_xml ? eye_cascade_xml : "";
  c->queue.cap = queue_cap > 0 ? queue_cap : 8;
  int n = n_threads > 0 ? n_threads : 4;
  c->active_workers = n;
  for (int i = 0; i < n; ++i)
    c->workers.emplace_back([c] { c->worker(); });
  return c;
}

// Fills out_clip [clip_len*crop*crop*3] uint8. Returns 1 on success,
// 0 when the corpus is exhausted.
int ml_corpus_next(void* handle, uint8_t* out_clip, int32_t* out_video_idx,
                   int32_t* out_start_frame) {
  auto* c = static_cast<Corpus*>(handle);
  Clip clip;
  if (!c->queue.pop(&clip)) return 0;
  if (!clip.data.empty())
    std::memcpy(out_clip, clip.data.data(), clip.data.size());
  *out_video_idx = clip.video_idx;  // negative (~vi): end-of-video marker
  *out_start_frame = clip.start_frame;
  return 1;
}

long ml_corpus_frames_decoded(void* handle) {
  return static_cast<Corpus*>(handle)->frames_decoded.load();
}

void ml_corpus_close(void* handle) {
  auto* c = static_cast<Corpus*>(handle);
  c->queue.close();
  c->next_video.store(1 << 30);  // stop claiming new videos
  for (auto& t : c->workers) t.join();
  delete c;
}

// Single-video convenience: decode + track + crop the whole video into
// caller-allocated [n_frames, crop, crop, 3]. Returns frames written.
// out_eyes ([max_frames, 4] = per-frame (ly, lx, ry, rx), or null) emits
// eye landmarks in source-pixel coordinates — the same layout as the
// precomputed <video>.landmarks.npy contract, so the native tracker and
// any external (stronger) tracker feed the identical alignment path.
int ml_decode_video(const char* path, int crop, const char* cascade_xml,
                    const char* eye_cascade_xml, int detect_every,
                    int use_lk, int align, uint8_t* out, int max_frames,
                    float* out_boxes /* [max_frames, 4] or null */,
                    float* out_eyes /* [max_frames, 4] or null */,
                    const float* init_eyes /* [4] (ly,lx,ry,rx) or
                                              null */) {
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return -1;
  FaceTracker tracker;
  if (cascade_xml && *cascade_xml && tracker.cascade.load(cascade_xml))
    tracker.enabled = true;
  tracker.detect_every = detect_every > 0 ? detect_every : 8;
  tracker.use_lk = use_lk != 0;
  EyeTracker eyes;
  const bool want_eyes = out_eyes != nullptr || align != 0;
  if (want_eyes && eye_cascade_xml && *eye_cascade_xml &&
      eyes.cascade.load(eye_cascade_xml))
    eyes.enabled = true;
  if (init_eyes) {
    // Known first-frame landmarks (external tracker / sidecar): seed
    // the eye tracker so LK tracks from them (also how the gt-init
    // parity tests drive the LK stage — the Haar eye cascade cannot
    // fire on procedural faces).
    std::memcpy(eyes.last, init_eyes, sizeof(eyes.last));
    eyes.has_last = true;
  }
  eyes.detect_every = tracker.detect_every;
  eyes.use_lk = use_lk != 0;
  cv::Mat bgr, rgb;
  int i = 0;
  const size_t frame_bytes = static_cast<size_t>(crop) * crop * 3;
  while (i < max_frames && cap.read(bgr)) {
    cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
    cv::Rect2f box = tracker.box_for(rgb, i);
    float eye_buf[4];
    if (want_eyes) eyes.eyes_for(rgb, box, i, tracker.cur_gray,
                                 tracker.cur_ds, eye_buf);
    if (align != 0)
      align_into(rgb, eye_buf, crop, out + frame_bytes * i);
    else
      crop_resize_into(rgb, box, crop, out + frame_bytes * i);
    if (out_boxes) {
      out_boxes[4 * i + 0] = box.y;
      out_boxes[4 * i + 1] = box.x;
      out_boxes[4 * i + 2] = box.height;
      out_boxes[4 * i + 3] = box.width;
    }
    if (out_eyes) std::memcpy(out_eyes + 4 * i, eye_buf,
                              sizeof(eye_buf));
    ++i;
  }
  return i;
}

}  // extern "C"
