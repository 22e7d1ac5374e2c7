// First-party compressed-video ingest: a thin C shim over the system
// libavformat/libavcodec (present in this image as shared libraries with
// no CLI or Python bindings), loaded via ctypes (data/avdecode.py).
//
// This is the route the reference takes through cv2.VideoCapture on its
// .mp4 recordings (util_track/mp_loader.py:90,213): container demux ->
// packet decode -> YUV420 planes / RGB24 frames, plus presentation
// timestamps. The planar output feeds the same fused AVX-512 tails
// (framepipe.cc) as the y4m reader, so H.264/HEVC/MPEG-4 recordings get
// the identical zero-float host path as uncompressed captures.
//
// An encoder half (avd_writer_*) produces real H.264 (libx264) / MPEG-4
// vectors for the self-contained decode tests and for overlay-video
// export parity with the reference's im_to_vid.

#include <cstdint>
#include <cstring>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

extern "C" {

// ---------------------------------------------------------------------------
// reader
// ---------------------------------------------------------------------------

struct AvdReader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int vstream = -1;
  AVPacket* pkt = nullptr;
  AVFrame* frm = nullptr;
  SwsContext* sws_rgb = nullptr;
  int sws_src_fmt = -1;
  AVRational tb{1, 1};
  int eof_sent = 0;
};

AvdReader* avd_open(const char* path) {
  AvdReader* r = new AvdReader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) goto fail;
  {
    const AVCodec* codec = nullptr;
    r->vstream =
        av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (r->vstream < 0 || !codec) goto fail;
    r->dec = avcodec_alloc_context3(codec);
    if (!r->dec) goto fail;
    if (avcodec_parameters_to_context(
            r->dec, r->fmt->streams[r->vstream]->codecpar) < 0)
      goto fail;
    if (avcodec_open2(r->dec, codec, nullptr) < 0) goto fail;
    r->tb = r->fmt->streams[r->vstream]->time_base;
    r->pkt = av_packet_alloc();
    r->frm = av_frame_alloc();
    if (!r->pkt || !r->frm) goto fail;
  }
  return r;
fail:
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->frm) av_frame_free(&r->frm);
  delete r;
  return nullptr;
}

void avd_close(AvdReader* r) {
  if (!r) return;
  if (r->sws_rgb) sws_freeContext(r->sws_rgb);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->frm) av_frame_free(&r->frm);
  delete r;
}

int avd_width(AvdReader* r) { return r->dec->width; }
int avd_height(AvdReader* r) { return r->dec->height; }

double avd_fps(AvdReader* r) {
  AVRational fr = r->fmt->streams[r->vstream]->avg_frame_rate;
  if (fr.num <= 0 || fr.den <= 0) fr = r->fmt->streams[r->vstream]->r_frame_rate;
  return (fr.num > 0 && fr.den > 0) ? av_q2d(fr) : 0.0;
}

int64_t avd_nframes(AvdReader* r) {  // container estimate; -1 unknown
  int64_t n = r->fmt->streams[r->vstream]->nb_frames;
  return n > 0 ? n : -1;
}

const char* avd_codec_name(AvdReader* r) { return r->dec->codec->name; }

// 1 if decoded frames are planar 4:2:0 limited-range (the fused-tail fast
// path); probing forces a decoder peek so the format is known.
int avd_is_yuv420(AvdReader* r) {
  return r->dec->pix_fmt == AV_PIX_FMT_YUV420P;
}

// decode one frame into r->frm. 0 = got frame, 1 = EOF, <0 = error.
static int decode_next(AvdReader* r) {
  for (;;) {
    int ret = avcodec_receive_frame(r->dec, r->frm);
    if (ret == 0) return 0;
    if (ret == AVERROR_EOF) return 1;
    if (ret != AVERROR(EAGAIN)) return ret;
    for (;;) {
      ret = av_read_frame(r->fmt, r->pkt);
      if (ret == AVERROR_EOF) {
        if (!r->eof_sent) {
          avcodec_send_packet(r->dec, nullptr);  // start drain
          r->eof_sent = 1;
        }
        break;
      }
      if (ret < 0) return ret;
      if (r->pkt->stream_index == r->vstream) {
        ret = avcodec_send_packet(r->dec, r->pkt);
        av_packet_unref(r->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(r->pkt);
    }
  }
}

static double frame_pts_seconds(AvdReader* r) {
  int64_t ts = r->frm->best_effort_timestamp;
  if (ts == AV_NOPTS_VALUE) ts = r->frm->pts;
  return ts == AV_NOPTS_VALUE ? -1.0 : ts * av_q2d(r->tb);
}

// next frame as packed RGB24 [h*w*3]. 1 = frame, 0 = EOF, <0 = error.
int avd_next_rgb(AvdReader* r, uint8_t* out, double* pts) {
  int ret = decode_next(r);
  if (ret == 1) return 0;
  if (ret < 0) return ret;
  if (!r->sws_rgb || r->sws_src_fmt != r->frm->format) {
    if (r->sws_rgb) sws_freeContext(r->sws_rgb);
    r->sws_rgb = sws_getContext(
        r->dec->width, r->dec->height, (AVPixelFormat)r->frm->format,
        r->dec->width, r->dec->height, AV_PIX_FMT_RGB24, SWS_BILINEAR,
        nullptr, nullptr, nullptr);
    r->sws_src_fmt = r->frm->format;
    if (!r->sws_rgb) return -1;
  }
  uint8_t* dst[1] = {out};
  int dst_stride[1] = {3 * r->dec->width};
  sws_scale(r->sws_rgb, r->frm->data, r->frm->linesize, 0, r->dec->height,
            dst, dst_stride);
  if (pts) *pts = frame_pts_seconds(r);
  return 1;
}

// next frame as 4:2:0 planes (y [h*w], u/v [ceil(h/2)*ceil(w/2)]).
// 1 = frame, 0 = EOF, 2 = frame is not YUV420P (caller must use the RGB
// path), <0 = error.
int avd_next_yuv420(AvdReader* r, uint8_t* y, uint8_t* u, uint8_t* v,
                    double* pts) {
  int ret = decode_next(r);
  if (ret == 1) return 0;
  if (ret < 0) return ret;
  if (r->frm->format != AV_PIX_FMT_YUV420P) return 2;
  const int h = r->dec->height, w = r->dec->width;
  const int ch = (h + 1) / 2, cw = (w + 1) / 2;
  for (int i = 0; i < h; i++)
    memcpy(y + (size_t)i * w, r->frm->data[0] + (size_t)i * r->frm->linesize[0], w);
  for (int i = 0; i < ch; i++) {
    memcpy(u + (size_t)i * cw, r->frm->data[1] + (size_t)i * r->frm->linesize[1], cw);
    memcpy(v + (size_t)i * cw, r->frm->data[2] + (size_t)i * r->frm->linesize[2], cw);
  }
  if (pts) *pts = frame_pts_seconds(r);
  return 1;
}

// ---------------------------------------------------------------------------
// writer (test vectors + overlay export)
// ---------------------------------------------------------------------------

struct AvdWriter {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* enc = nullptr;
  AVStream* stream = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frm = nullptr;
  SwsContext* sws = nullptr;
  int64_t next_pts = 0;
};

static int writer_drain(AvdWriter* w) {
  for (;;) {
    int ret = avcodec_receive_packet(w->enc, w->pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
    if (ret < 0) return ret;
    // one frame per packet at the encoder time_base (1/fps). Without an
    // explicit duration the mp4 muxer records the LAST sample as
    // zero-length and the demuxer then hides the final frame entirely
    // (duration 15*512 instead of 16*512 — observed, not hypothetical).
    w->pkt->duration = 1;
    av_packet_rescale_ts(w->pkt, w->enc->time_base, w->stream->time_base);
    w->pkt->stream_index = w->stream->index;
    ret = av_interleaved_write_frame(w->fmt, w->pkt);
    if (ret < 0) return ret;
  }
}

AvdWriter* avd_writer_open(const char* path, int width, int height, int fps,
                           const char* codec_name, int crf) {
  AvdWriter* w = new AvdWriter();
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) goto fail;
  if (avformat_alloc_output_context2(&w->fmt, nullptr, nullptr, path) < 0)
    goto fail;
  w->stream = avformat_new_stream(w->fmt, nullptr);
  w->enc = avcodec_alloc_context3(codec);
  if (!w->stream || !w->enc) goto fail;
  w->enc->width = width;
  w->enc->height = height;
  w->enc->time_base = AVRational{1, fps};
  w->enc->framerate = AVRational{fps, 1};
  w->enc->pix_fmt = AV_PIX_FMT_YUV420P;
  w->enc->gop_size = 12;
  if (w->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    w->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (strcmp(codec_name, "libx264") == 0) {
    av_opt_set(w->enc->priv_data, "preset", "veryfast", 0);
    av_opt_set_int(w->enc->priv_data, "crf", crf > 0 ? crf : 18, 0);
  } else {
    w->enc->bit_rate = (int64_t)4000000;
  }
  if (avcodec_open2(w->enc, codec, nullptr) < 0) goto fail;
  if (avcodec_parameters_from_context(w->stream->codecpar, w->enc) < 0)
    goto fail;
  w->stream->time_base = w->enc->time_base;
  if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&w->fmt->pb, path, AVIO_FLAG_WRITE) < 0) goto fail;
  }
  if (avformat_write_header(w->fmt, nullptr) < 0) goto fail;
  w->pkt = av_packet_alloc();
  w->frm = av_frame_alloc();
  if (!w->pkt || !w->frm) goto fail;
  w->frm->format = AV_PIX_FMT_YUV420P;
  w->frm->width = width;
  w->frm->height = height;
  if (av_frame_get_buffer(w->frm, 0) < 0) goto fail;
  w->sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                          AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr,
                          nullptr);
  if (!w->sws) goto fail;
  return w;
fail:
  if (w->enc) avcodec_free_context(&w->enc);
  if (w->fmt) {
    if (w->fmt->pb) avio_closep(&w->fmt->pb);
    avformat_free_context(w->fmt);
  }
  if (w->pkt) av_packet_free(&w->pkt);
  if (w->frm) av_frame_free(&w->frm);
  delete w;
  return nullptr;
}

int avd_writer_add_rgb(AvdWriter* w, const uint8_t* rgb) {
  if (av_frame_make_writable(w->frm) < 0) return -1;
  const uint8_t* src[1] = {rgb};
  int src_stride[1] = {3 * w->enc->width};
  sws_scale(w->sws, src, src_stride, 0, w->enc->height, w->frm->data,
            w->frm->linesize);
  w->frm->pts = w->next_pts++;
  int ret = avcodec_send_frame(w->enc, w->frm);
  if (ret < 0) return ret;
  return writer_drain(w);
}

int avd_writer_close(AvdWriter* w) {
  if (!w) return 0;
  int ret = 0;
  if (w->enc) {
    avcodec_send_frame(w->enc, nullptr);  // flush
    ret = writer_drain(w);
    if (ret == 0) ret = av_write_trailer(w->fmt);
  }
  if (w->sws) sws_freeContext(w->sws);
  if (w->enc) avcodec_free_context(&w->enc);
  if (w->fmt) {
    if (w->fmt->pb) avio_closep(&w->fmt->pb);
    avformat_free_context(w->fmt);
  }
  if (w->pkt) av_packet_free(&w->pkt);
  if (w->frm) av_frame_free(&w->frm);
  delete w;
  return ret;
}

// 1 if this build's libavcodec can decode `name` (e.g. "h264", "hevc")
int avd_has_decoder(const char* name) {
  return avcodec_find_decoder_by_name(name) != nullptr;
}
int avd_has_encoder(const char* name) {
  return avcodec_find_encoder_by_name(name) != nullptr;
}

}  // extern "C"
