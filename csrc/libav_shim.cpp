// C-ABI shim over libavcodec for swiftvideo_tpu's codec layer.
//
// Role parity with the reference's linked-FFmpeg codec modules
// (/root/reference/Sources/SwiftVideo_FFmpeg/dec.video.ffmpeg.swift:24-221,
// enc.video.ffmpeg.swift:21-297, dec.audio.ffmpeg.swift, enc.audio.ffmpeg.swift):
// the reference calls libavcodec in-process from Swift; this shim exposes the
// same send/receive codec surface over a C ABI consumed from Python via
// ctypes (swiftvideo_tpu/codec/libav.py).
//
// Design notes:
//  * send/receive mirrors avcodec's own model 1:1 — no transcoding loops or
//    policy here; framing, timestamp bookkeeping and sample conventions live
//    on the Python side where they are unit-tested.
//  * one AVFrame/AVPacket is held per handle between recv calls so the
//    returned plane/data pointers stay valid until the next call on that
//    handle (Python copies immediately).
//  * timestamps are opaque int64 ids: the Python side maps ids to TimePoints,
//    so no rational-timebase conversion happens across the ABI.
//  * all functions return 0/positive on success, negative AVERROR on failure;
//    sv_last_error() returns the per-handle human-readable message.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
}

#include <cstdint>
#include <cstring>
#include <string>

namespace {

struct CodecHandle {
    AVCodecContext *ctx = nullptr;
    AVFrame *frame = nullptr;    // held between recv calls
    AVPacket *pkt = nullptr;     // held between recv calls
    std::string err;

    ~CodecHandle() {
        if (ctx) avcodec_free_context(&ctx);
        if (frame) av_frame_free(&frame);
        if (pkt) av_packet_free(&pkt);
    }

    int fail(int code, const char *what) {
        char buf[256];
        av_strerror(code, buf, sizeof(buf));
        err = std::string(what) + ": " + buf;
        return code;
    }
};

// Parse "k=v,k=v" into an AVDictionary (',' separated; values may contain
// ':' so x264-params style sub-options pass through intact).
AVDictionary *parse_opts(const char *opts) {
    AVDictionary *dict = nullptr;
    if (opts && *opts)
        av_dict_parse_string(&dict, opts, "=", ",", 0);
    return dict;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// errors / version
// ---------------------------------------------------------------------------

const char *sv_av_last_error(void *handle) {
    return handle ? static_cast<CodecHandle *>(handle)->err.c_str() : "";
}

unsigned sv_avcodec_version(void) { return avcodec_version(); }

void sv_av_set_log_level(int level) { av_log_set_level(level); }

int sv_av_codec_exists(const char *name, int encoder) {
    return encoder ? (avcodec_find_encoder_by_name(name) != nullptr)
                   : (avcodec_find_decoder_by_name(name) != nullptr);
}

// ---------------------------------------------------------------------------
// generic open / close
// ---------------------------------------------------------------------------

// Open a DECODER by codec name with optional extradata (avcC/hvcC/ASC/
// OpusHead — libavcodec auto-detects record-framed extradata and switches
// e.g. h264 into length-prefixed AVCC packet mode, exactly how the reference
// passes codecpar through (dec.video.ffmpeg.swift:60-87)).
void *sv_dec_open(const char *codec_name, const uint8_t *extradata,
                  int extradata_size, int sample_rate, int channels) {
    const AVCodec *codec = avcodec_find_decoder_by_name(codec_name);
    if (!codec) return nullptr;
    auto *h = new CodecHandle();
    h->ctx = avcodec_alloc_context3(codec);
    h->frame = av_frame_alloc();
    h->pkt = av_packet_alloc();
    if (!h->ctx || !h->frame || !h->pkt) { delete h; return nullptr; }
    h->ctx->thread_count = 1;  // deterministic latency; host is 1-core
    if (extradata_size > 0) {
        h->ctx->extradata = (uint8_t *)av_mallocz(
            extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(h->ctx->extradata, extradata, extradata_size);
        h->ctx->extradata_size = extradata_size;
    }
    if (sample_rate > 0) h->ctx->sample_rate = sample_rate;
    if (channels > 0) av_channel_layout_default(&h->ctx->ch_layout, channels);
    int rc = avcodec_open2(h->ctx, codec, nullptr);
    if (rc < 0) { delete h; return nullptr; }
    return h;
}

void sv_codec_free(void *handle) { delete static_cast<CodecHandle *>(handle); }

// Feed one packet (pts is an opaque id). data=NULL => EOF (drain mode).
int sv_dec_send(void *handle, const uint8_t *data, int size, int64_t pts) {
    auto *h = static_cast<CodecHandle *>(handle);
    if (!data) {
        int rc = avcodec_send_packet(h->ctx, nullptr);
        return (rc < 0 && rc != AVERROR_EOF) ? h->fail(rc, "send eof") : 0;
    }
    AVPacket *pkt = av_packet_alloc();
    int rc = av_new_packet(pkt, size);
    if (rc < 0) { av_packet_free(&pkt); return h->fail(rc, "alloc packet"); }
    memcpy(pkt->data, data, size);
    pkt->pts = pts;
    pkt->dts = pts;
    rc = avcodec_send_packet(h->ctx, pkt);
    av_packet_free(&pkt);
    return rc < 0 ? h->fail(rc, "send packet") : 0;
}

// ---------------------------------------------------------------------------
// video decode receive
// ---------------------------------------------------------------------------

// Receive one decoded video frame.
// Returns 1 = frame filled, 0 = need more input (EAGAIN), -541478725 = EOF,
// other negative = error.  Pointers remain valid until the next call.
// fmt_name receives the AVPixelFormat name (e.g. "yuv420p", "nv12").
int sv_vdec_recv(void *handle, int *width, int *height,
                 const char **fmt_name, int64_t *pts,
                 const uint8_t **planes, int *strides, int *heights) {
    auto *h = static_cast<CodecHandle *>(handle);
    av_frame_unref(h->frame);
    int rc = avcodec_receive_frame(h->ctx, h->frame);
    if (rc == AVERROR(EAGAIN)) return 0;
    if (rc == AVERROR_EOF) return rc;
    if (rc < 0) return h->fail(rc, "receive frame");
    const AVFrame *f = h->frame;
    *width = f->width;
    *height = f->height;
    *fmt_name = av_get_pix_fmt_name((AVPixelFormat)f->format);
    *pts = f->pts;
    auto *desc = av_pix_fmt_desc_get((AVPixelFormat)f->format);
    for (int i = 0; i < 4; i++) {
        planes[i] = f->data[i];
        strides[i] = f->linesize[i];
        if (f->data[i] && desc) {
            int shift = (i == 1 || i == 2) ? desc->log2_chroma_h : 0;
            heights[i] = AV_CEIL_RSHIFT(f->height, shift);
        } else {
            heights[i] = 0;
        }
    }
    return 1;
}

// ---------------------------------------------------------------------------
// audio decode receive
// ---------------------------------------------------------------------------

// Receive one decoded audio frame.  Same return convention as sv_vdec_recv.
// fmt_name receives the AVSampleFormat name ("fltp", "s16", ...).
int sv_adec_recv(void *handle, int *sample_rate, int *channels,
                 int *nb_samples, const char **fmt_name, int64_t *pts,
                 const uint8_t **planes) {
    auto *h = static_cast<CodecHandle *>(handle);
    av_frame_unref(h->frame);
    int rc = avcodec_receive_frame(h->ctx, h->frame);
    if (rc == AVERROR(EAGAIN)) return 0;
    if (rc == AVERROR_EOF) return rc;
    if (rc < 0) return h->fail(rc, "receive frame");
    const AVFrame *f = h->frame;
    *sample_rate = f->sample_rate;
    *channels = f->ch_layout.nb_channels;
    *nb_samples = f->nb_samples;
    *fmt_name = av_get_sample_fmt_name((AVSampleFormat)f->format);
    *pts = f->pts;
    int nplanes = av_sample_fmt_is_planar((AVSampleFormat)f->format)
                      ? f->ch_layout.nb_channels : 1;
    for (int i = 0; i < 8; i++)
        planes[i] = (i < nplanes) ? f->extended_data[i] : nullptr;
    return 1;
}

// ---------------------------------------------------------------------------
// video encode
// ---------------------------------------------------------------------------

// Open a video ENCODER.  opts is "k=v,k=v" passed to avcodec_open2 (handles
// both generic and codec-private options, e.g. preset/tune/x264-params).
// pix_fmt_name: input pixel format ("yuv420p").  GLOBAL_HEADER is always set
// so parameter sets land in extradata (sv_enc_extradata) instead of in-band,
// mirroring the reference's extradata-driven config records
// (enc.video.ffmpeg.swift:240-265).
void *sv_venc_open(const char *codec_name, int width, int height,
                   const char *pix_fmt_name, int fps_num, int fps_den,
                   int64_t bit_rate, int gop_size, const char *opts) {
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return nullptr;
    AVPixelFormat pix = av_get_pix_fmt(pix_fmt_name);
    if (pix == AV_PIX_FMT_NONE) return nullptr;
    auto *h = new CodecHandle();
    h->ctx = avcodec_alloc_context3(codec);
    h->frame = av_frame_alloc();
    h->pkt = av_packet_alloc();
    if (!h->ctx || !h->frame || !h->pkt) { delete h; return nullptr; }
    h->ctx->width = width;
    h->ctx->height = height;
    h->ctx->pix_fmt = pix;
    h->ctx->time_base = AVRational{fps_den, fps_num};
    h->ctx->framerate = AVRational{fps_num, fps_den};
    h->ctx->bit_rate = bit_rate;
    h->ctx->gop_size = gop_size;
    h->ctx->max_b_frames = 0;
    h->ctx->thread_count = 1;
    h->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    AVDictionary *dict = parse_opts(opts);
    int rc = avcodec_open2(h->ctx, codec, &dict);
    av_dict_free(&dict);
    if (rc < 0) { delete h; return nullptr; }
    return h;
}

int sv_enc_extradata(void *handle, const uint8_t **data, int *size) {
    auto *h = static_cast<CodecHandle *>(handle);
    *data = h->ctx->extradata;
    *size = h->ctx->extradata_size;
    return 0;
}

// Send one y420p frame (tight strides from Python: stride[0]=w,
// stride[1..2]=w/2).  planes=NULL => EOF.  keyframe!=0 forces an IDR (the
// reference forces keyframes on config changes the same way).
int sv_venc_send(void *handle, const uint8_t *const *planes,
                 const int *strides, int64_t pts, int keyframe) {
    auto *h = static_cast<CodecHandle *>(handle);
    if (!planes) {
        int rc = avcodec_send_frame(h->ctx, nullptr);
        return (rc < 0 && rc != AVERROR_EOF) ? h->fail(rc, "send eof") : 0;
    }
    AVFrame *f = h->frame;
    av_frame_unref(f);
    f->format = h->ctx->pix_fmt;
    f->width = h->ctx->width;
    f->height = h->ctx->height;
    int rc = av_frame_get_buffer(f, 0);
    if (rc < 0) return h->fail(rc, "frame buffer");
    auto *desc = av_pix_fmt_desc_get(h->ctx->pix_fmt);
    int nplanes = av_pix_fmt_count_planes(h->ctx->pix_fmt);
    for (int i = 0; i < nplanes; i++) {
        int ph = (i == 1 || i == 2)
                     ? AV_CEIL_RSHIFT(f->height, desc->log2_chroma_h)
                     : f->height;
        for (int y = 0; y < ph; y++)
            memcpy(f->data[i] + (size_t)y * f->linesize[i],
                   planes[i] + (size_t)y * strides[i], strides[i]);
    }
    f->pts = pts;
    if (keyframe) {
        f->pict_type = AV_PICTURE_TYPE_I;
#ifdef AV_FRAME_FLAG_KEY
        f->flags |= AV_FRAME_FLAG_KEY;
#else
        f->key_frame = 1;
#endif
    }
    rc = avcodec_send_frame(h->ctx, f);
    return rc < 0 ? h->fail(rc, "send frame") : 0;
}

// Receive one encoded packet.  1 = packet, 0 = EAGAIN, AVERROR_EOF, <0 err.
// flags bit0 = keyframe.
int sv_enc_recv(void *handle, const uint8_t **data, int *size, int64_t *pts,
                int64_t *dts, int *flags) {
    auto *h = static_cast<CodecHandle *>(handle);
    av_packet_unref(h->pkt);
    int rc = avcodec_receive_packet(h->ctx, h->pkt);
    if (rc == AVERROR(EAGAIN)) return 0;
    if (rc == AVERROR_EOF) return rc;
    if (rc < 0) return h->fail(rc, "receive packet");
    *data = h->pkt->data;
    *size = h->pkt->size;
    *pts = h->pkt->pts;
    *dts = h->pkt->dts;
    *flags = (h->pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
    return 1;
}

// ---------------------------------------------------------------------------
// audio encode
// ---------------------------------------------------------------------------

void *sv_aenc_open(const char *codec_name, int sample_rate, int channels,
                   const char *sample_fmt_name, int64_t bit_rate,
                   const char *opts) {
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return nullptr;
    AVSampleFormat fmt = av_get_sample_fmt(sample_fmt_name);
    if (fmt == AV_SAMPLE_FMT_NONE) return nullptr;
    auto *h = new CodecHandle();
    h->ctx = avcodec_alloc_context3(codec);
    h->frame = av_frame_alloc();
    h->pkt = av_packet_alloc();
    if (!h->ctx || !h->frame || !h->pkt) { delete h; return nullptr; }
    h->ctx->sample_rate = sample_rate;
    av_channel_layout_default(&h->ctx->ch_layout, channels);
    h->ctx->sample_fmt = fmt;
    h->ctx->bit_rate = bit_rate;
    h->ctx->time_base = AVRational{1, sample_rate};
    h->ctx->thread_count = 1;
    h->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    AVDictionary *dict = parse_opts(opts);
    int rc = avcodec_open2(h->ctx, codec, &dict);
    av_dict_free(&dict);
    if (rc < 0) { delete h; return nullptr; }
    return h;
}

int sv_aenc_frame_size(void *handle) {
    return static_cast<CodecHandle *>(handle)->ctx->frame_size;
}

// Send nb_samples of audio.  planes: per-channel pointers for planar
// formats, planes[0] only for interleaved.  planes=NULL => EOF.
int sv_aenc_send(void *handle, const uint8_t *const *planes, int nb_samples,
                 int64_t pts) {
    auto *h = static_cast<CodecHandle *>(handle);
    if (!planes) {
        int rc = avcodec_send_frame(h->ctx, nullptr);
        return (rc < 0 && rc != AVERROR_EOF) ? h->fail(rc, "send eof") : 0;
    }
    AVFrame *f = h->frame;
    av_frame_unref(f);
    f->format = h->ctx->sample_fmt;
    f->nb_samples = nb_samples;
    f->sample_rate = h->ctx->sample_rate;
    av_channel_layout_copy(&f->ch_layout, &h->ctx->ch_layout);
    int rc = av_frame_get_buffer(f, 0);
    if (rc < 0) return h->fail(rc, "frame buffer");
    int planar = av_sample_fmt_is_planar(h->ctx->sample_fmt);
    int bps = av_get_bytes_per_sample(h->ctx->sample_fmt);
    int nplanes = planar ? h->ctx->ch_layout.nb_channels : 1;
    size_t per = (size_t)nb_samples * bps *
                 (planar ? 1 : h->ctx->ch_layout.nb_channels);
    for (int i = 0; i < nplanes; i++)
        memcpy(f->extended_data[i], planes[i], per);
    f->pts = pts;
    rc = avcodec_send_frame(h->ctx, f);
    return rc < 0 ? h->fail(rc, "send frame") : 0;
}

// ---------------------------------------------------------------------------
// container demux (libavformat) — role parity with the reference's
// file.ffmpeg.swift stream mapping (file.ffmpeg.swift:44-72)
// ---------------------------------------------------------------------------

struct DemuxHandle {
    AVFormatContext *fmt = nullptr;
    AVPacket *pkt = nullptr;
    std::string err;

    ~DemuxHandle() {
        if (pkt) av_packet_free(&pkt);
        if (fmt) avformat_close_input(&fmt);
    }

    int fail(int code, const char *what) {
        char buf[256];
        av_strerror(code, buf, sizeof(buf));
        err = std::string(what) + ": " + buf;
        return code;
    }
};

const char *sv_demux_last_error(void *handle) {
    return handle ? static_cast<DemuxHandle *>(handle)->err.c_str() : "";
}

void *sv_demux_open(const char *path) {
    auto *h = new DemuxHandle();
    h->pkt = av_packet_alloc();
    int rc = avformat_open_input(&h->fmt, path, nullptr, nullptr);
    if (rc < 0) { delete h; return nullptr; }
    rc = avformat_find_stream_info(h->fmt, nullptr);
    if (rc < 0) { delete h; return nullptr; }
    return h;
}

void sv_demux_free(void *handle) { delete static_cast<DemuxHandle *>(handle); }

int sv_demux_nb_streams(void *handle) {
    return (int)static_cast<DemuxHandle *>(handle)->fmt->nb_streams;
}

// Stream metadata.  media_type: 0 video, 1 audio, 2 other.  Timestamps read
// via sv_demux_read are in time_base_num/time_base_den units.
int sv_demux_stream_info(void *handle, int index, const char **codec_name,
                         int *media_type, int *width, int *height,
                         int *sample_rate, int *channels,
                         const uint8_t **extradata, int *extradata_size,
                         int *tb_num, int *tb_den, int *fps_num,
                         int *fps_den, int64_t *duration) {
    auto *h = static_cast<DemuxHandle *>(handle);
    if (index < 0 || index >= (int)h->fmt->nb_streams) return -1;
    AVStream *st = h->fmt->streams[index];
    AVCodecParameters *par = st->codecpar;
    const AVCodecDescriptor *desc = avcodec_descriptor_get(par->codec_id);
    *codec_name = desc ? desc->name : "unknown";
    *media_type = par->codec_type == AVMEDIA_TYPE_VIDEO ? 0
                : par->codec_type == AVMEDIA_TYPE_AUDIO ? 1 : 2;
    *width = par->width;
    *height = par->height;
    *sample_rate = par->sample_rate;
    *channels = par->ch_layout.nb_channels;
    *extradata = par->extradata;
    *extradata_size = par->extradata_size;
    *tb_num = st->time_base.num;
    *tb_den = st->time_base.den;
    AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate
                                           : st->r_frame_rate;
    *fps_num = fr.num;
    *fps_den = fr.den;
    *duration = st->duration;
    return 0;
}

// Read the next packet.  1 = packet (data valid until next call),
// AVERROR_EOF at end, <0 error.  pts/dts in the stream's time_base,
// AV_NOPTS_VALUE (-9223372036854775808) when absent.  flags bit0=keyframe.
int sv_demux_read(void *handle, int *stream_index, const uint8_t **data,
                  int *size, int64_t *pts, int64_t *dts, int64_t *duration,
                  int *flags) {
    auto *h = static_cast<DemuxHandle *>(handle);
    av_packet_unref(h->pkt);
    int rc = av_read_frame(h->fmt, h->pkt);
    if (rc == AVERROR_EOF) return rc;
    if (rc < 0) return h->fail(rc, "read frame");
    *stream_index = h->pkt->stream_index;
    *data = h->pkt->data;
    *size = h->pkt->size;
    *pts = h->pkt->pts;
    *dts = h->pkt->dts;
    *duration = h->pkt->duration;
    *flags = (h->pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
    return 1;
}

// Seek back to the start of every stream (FileSource loop support — the
// reference's FileSource seeks the same way, file.ffmpeg.swift:208-216).
int sv_demux_seek_start(void *handle) {
    auto *h = static_cast<DemuxHandle *>(handle);
    int rc = av_seek_frame(h->fmt, -1, 0,
                           AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_ANY);
    if (rc < 0) return h->fail(rc, "seek");
    return 0;
}

// ---------------------------------------------------------------------------
// container mux (libavformat)
// ---------------------------------------------------------------------------

struct MuxHandle {
    AVFormatContext *fmt = nullptr;
    bool header_written = false;
    std::string err;

    ~MuxHandle() {
        if (fmt) {
            if (fmt->pb && !(fmt->oformat->flags & AVFMT_NOFILE))
                avio_closep(&fmt->pb);
            avformat_free_context(fmt);
        }
    }

    int fail(int code, const char *what) {
        char buf[256];
        av_strerror(code, buf, sizeof(buf));
        err = std::string(what) + ": " + buf;
        return code;
    }
};

const char *sv_mux_last_error(void *handle) {
    return handle ? static_cast<MuxHandle *>(handle)->err.c_str() : "";
}

void *sv_mux_open(const char *path, const char *format_name) {
    AVFormatContext *fmt = nullptr;
    int rc = avformat_alloc_output_context2(
        &fmt, nullptr, format_name && *format_name ? format_name : nullptr,
        path);
    if (rc < 0 || !fmt) return nullptr;
    auto *h = new MuxHandle();
    h->fmt = fmt;
    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
        rc = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE);
        if (rc < 0) { delete h; return nullptr; }
    }
    return h;
}

void sv_mux_free(void *handle) { delete static_cast<MuxHandle *>(handle); }

// Add a stream before writing the header.  Returns the stream index or <0.
// Timestamps for sv_mux_write on this stream are in 1/tb_den units
// (tb_num fixed at 1: Python passes e.g. 90000 video / sample_rate audio).
int sv_mux_add_stream(void *handle, const char *codec_name, int media_type,
                      int width, int height, int sample_rate, int channels,
                      const uint8_t *extradata, int extradata_size,
                      int tb_den) {
    auto *h = static_cast<MuxHandle *>(handle);
    if (h->header_written) return h->fail(-1, "header already written");
    const AVCodecDescriptor *desc = avcodec_descriptor_get_by_name(codec_name);
    if (!desc) return h->fail(-1, "unknown codec");
    AVStream *st = avformat_new_stream(h->fmt, nullptr);
    if (!st) return h->fail(-1, "new stream");
    AVCodecParameters *par = st->codecpar;
    par->codec_id = desc->id;
    par->codec_type = media_type == 0 ? AVMEDIA_TYPE_VIDEO
                                      : AVMEDIA_TYPE_AUDIO;
    par->width = width;
    par->height = height;
    par->sample_rate = sample_rate;
    if (channels > 0) av_channel_layout_default(&par->ch_layout, channels);
    if (extradata_size > 0) {
        par->extradata = (uint8_t *)av_mallocz(
            extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(par->extradata, extradata, extradata_size);
        par->extradata_size = extradata_size;
    }
    st->time_base = AVRational{1, tb_den};
    return st->index;
}

int sv_mux_write_header(void *handle) {
    auto *h = static_cast<MuxHandle *>(handle);
    int rc = avformat_write_header(h->fmt, nullptr);
    if (rc < 0) return h->fail(rc, "write header");
    h->header_written = true;
    return 0;
}

// Write one packet.  pts/dts in the tb_den units declared at add_stream
// time; the muxer rescales to whatever the container negotiated.
int sv_mux_write(void *handle, int stream_index, const uint8_t *data,
                 int size, int64_t pts, int64_t dts, int64_t duration,
                 int keyframe, int tb_den) {
    auto *h = static_cast<MuxHandle *>(handle);
    if (stream_index < 0 || stream_index >= (int)h->fmt->nb_streams)
        return h->fail(-1, "bad stream index");
    AVPacket *pkt = av_packet_alloc();
    int rc = av_new_packet(pkt, size);
    if (rc < 0) { av_packet_free(&pkt); return h->fail(rc, "alloc"); }
    memcpy(pkt->data, data, size);
    pkt->stream_index = stream_index;
    AVRational src{1, tb_den};
    AVRational dst = h->fmt->streams[stream_index]->time_base;
    pkt->pts = av_rescale_q(pts, src, dst);
    pkt->dts = av_rescale_q(dts, src, dst);
    if (duration > 0) pkt->duration = av_rescale_q(duration, src, dst);
    if (keyframe) pkt->flags |= AV_PKT_FLAG_KEY;
    rc = av_interleaved_write_frame(h->fmt, pkt);
    av_packet_free(&pkt);
    return rc < 0 ? h->fail(rc, "write frame") : 0;
}

int sv_mux_write_trailer(void *handle) {
    auto *h = static_cast<MuxHandle *>(handle);
    if (!h->header_written) return 0;
    int rc = av_write_trailer(h->fmt);
    return rc < 0 ? h->fail(rc, "write trailer") : 0;
}

}  // extern "C"
