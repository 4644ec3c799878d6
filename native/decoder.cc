// libwdvideo — host video decoder for the TPU input pipeline.
//
// TPU-native replacement for the reference's OpenCV/decord decode path
// (reference workoutdetector/utils/inference_count.py:218,312 cv2 loops;
// utils/visualize.py:283 decord). Decodes with libavformat/libavcodec and
// performs the inference-geometry resize (short side -> scale, bilinear)
// plus center-crop in the SAME swscale pass, so the Python layer only ever
// sees fixed-shape (crop x crop x 3) uint8 frames ready for the device.
//
// C ABI (ctypes-friendly):
//   wd_open(path)                          -> opaque handle (NULL on error)
//   wd_close(handle)
//   wd_frame_count(handle)                 -> number of frames (estimate; <0 err)
//   wd_fps(handle)                         -> frames per second
//   wd_dims(handle, &w, &h)                -> source dimensions
//   wd_read_cropped(handle, buf, max, scale, crop) -> frames written
//   wd_read_raw(handle, buf, max)          -> frames written at source size
//
// Build: see native/Makefile (links avformat avcodec avutil swscale).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int sws_w = 0, sws_h = 0;  // cached sws target
  bool drained = false;
};

void destroy(Decoder* d) {
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

// Pull the next decoded frame into d->frame. Returns 1 on frame, 0 on EOF,
// <0 on error.
int next_frame(Decoder* d) {
  while (true) {
    int r = avcodec_receive_frame(d->codec, d->frame);
    if (r == 0) return 1;
    if (r == AVERROR_EOF) return 0;
    if (r != AVERROR(EAGAIN)) return r;
    if (d->drained) return 0;
    // feed more packets
    while (true) {
      r = av_read_frame(d->fmt, d->pkt);
      if (r == AVERROR_EOF) {
        avcodec_send_packet(d->codec, nullptr);  // flush
        d->drained = true;
        break;
      }
      if (r < 0) return r;
      if (d->pkt->stream_index == d->stream_index) {
        r = avcodec_send_packet(d->codec, d->pkt);
        av_packet_unref(d->pkt);
        if (r < 0 && r != AVERROR(EAGAIN)) return r;
        break;
      }
      av_packet_unref(d->pkt);
    }
  }
}

// Convert d->frame to RGB24 at (dst_w, dst_h) into dst (row-major, packed).
int convert(Decoder* d, uint8_t* dst, int dst_w, int dst_h) {
  if (!d->sws || d->sws_w != dst_w || d->sws_h != dst_h) {
    if (d->sws) sws_freeContext(d->sws);
    // SWS_AREA on downscale for antialiased output (parity with the
    // PIL-antialias path the reference deploys); bilinear otherwise.
    const int flags = (dst_w < d->codec->width || dst_h < d->codec->height)
                          ? SWS_AREA
                          : SWS_BILINEAR;
    d->sws = sws_getContext(d->codec->width, d->codec->height, d->codec->pix_fmt,
                            dst_w, dst_h, AV_PIX_FMT_RGB24, flags, nullptr,
                            nullptr, nullptr);
    if (!d->sws) return -1;
    d->sws_w = dst_w;
    d->sws_h = dst_h;
  }
  uint8_t* planes[4] = {dst, nullptr, nullptr, nullptr};
  int strides[4] = {dst_w * 3, 0, 0, 0};
  sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, d->codec->height, planes,
            strides);
  return 0;
}

}  // namespace

extern "C" {

void* wd_open(const char* path) {
  auto* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_index < 0 || !dec) {
    destroy(d);
    return nullptr;
  }
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec,
                                d->fmt->streams[d->stream_index]->codecpar);
  d->codec->thread_count = 0;  // auto (frame+slice threading)
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  return d;
}

void wd_close(void* h) { destroy(static_cast<Decoder*>(h)); }

long long wd_frame_count(void* h) {
  auto* d = static_cast<Decoder*>(h);
  AVStream* st = d->fmt->streams[d->stream_index];
  if (st->nb_frames > 0) return st->nb_frames;
  // estimate from duration
  if (st->duration > 0 && st->avg_frame_rate.den > 0) {
    double sec = st->duration * av_q2d(st->time_base);
    return static_cast<long long>(sec * av_q2d(st->avg_frame_rate) + 0.5);
  }
  return -1;
}

double wd_fps(void* h) {
  auto* d = static_cast<Decoder*>(h);
  AVStream* st = d->fmt->streams[d->stream_index];
  return st->avg_frame_rate.den > 0 ? av_q2d(st->avg_frame_rate) : 0.0;
}

void wd_dims(void* h, int* w, int* out_h) {
  auto* d = static_cast<Decoder*>(h);
  *w = d->codec->width;
  *out_h = d->codec->height;
}

// Decode up to max_frames, each resized so short side == scale (aspect
// preserved) then center-cropped to crop x crop. buf must hold
// max_frames * crop * crop * 3 bytes. Returns frames written.
long long wd_read_cropped(void* h, void* buf, long long max_frames, int scale,
                          int crop) {
  auto* d = static_cast<Decoder*>(h);
  auto* out = static_cast<uint8_t*>(buf);
  const int src_w = d->codec->width, src_h = d->codec->height;
  // crop > scale would read past the scratch rows/cols below; resizing
  // the short side to >= crop keeps the center-crop in bounds (the
  // Python layer normalizes too — this is defense in depth)
  if (scale < crop) scale = crop;
  int rs_w, rs_h;
  if (src_h <= src_w) {
    rs_h = scale;
    rs_w = std::max(1, static_cast<int>(src_w * static_cast<double>(scale) / src_h + 0.5));
  } else {
    rs_w = scale;
    rs_h = std::max(1, static_cast<int>(src_h * static_cast<double>(scale) / src_w + 0.5));
  }
  const int x0 = std::max(0, (rs_w - crop) / 2);
  const int y0 = std::max(0, (rs_h - crop) / 2);

  // scratch for the resized frame; crop is a memcpy of row segments
  uint8_t* scratch = new uint8_t[static_cast<size_t>(rs_w) * rs_h * 3];
  long long n = 0;
  while (n < max_frames) {
    int r = next_frame(d);
    if (r <= 0) break;
    if (convert(d, scratch, rs_w, rs_h) < 0) break;
    uint8_t* dst = out + static_cast<size_t>(n) * crop * crop * 3;
    for (int y = 0; y < crop; ++y) {
      std::memcpy(dst + static_cast<size_t>(y) * crop * 3,
                  scratch + (static_cast<size_t>(y0 + y) * rs_w + x0) * 3,
                  static_cast<size_t>(crop) * 3);
    }
    ++n;
  }
  delete[] scratch;
  return n;
}

// Decode up to max_frames at source resolution (RGB24). buf must hold
// max_frames * width * height * 3 bytes. Returns frames written.
long long wd_read_raw(void* h, void* buf, long long max_frames) {
  auto* d = static_cast<Decoder*>(h);
  auto* out = static_cast<uint8_t*>(buf);
  const int w = d->codec->width, hh = d->codec->height;
  long long n = 0;
  while (n < max_frames) {
    int r = next_frame(d);
    if (r <= 0) break;
    if (convert(d, out + static_cast<size_t>(n) * w * hh * 3, w, hh) < 0) break;
    ++n;
  }
  return n;
}

}  // extern "C"
