"""RTMP media framing: FLV tags + onMetaData.

Reference semantics: ``serializeMedia`` / ``createMetadata``
(serialize.swift:24-90) and the config-resend / first-keyframe gating of
``rtmp.Serialize`` (rtmp.swift:562-609).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ...core import rescale
from ...media.coded import (BasicAudioDescription, BasicVideoDescription,
                            CodedMediaSample, MediaType, is_keyframe)
from . import amf
from .chunks import Chunk, ChunkSerializer


def serialize_media(sample: CodedMediaSample, serializer: ChunkSerializer,
                    msg_stream_id: int, prev_dts: Dict[int, int],
                    send_config: bool = False) -> bytes:
    """One media message as chunk bytes (serialize.swift:24-55)."""
    if sample.media_type not in (MediaType.video, MediaType.audio):
        return b""
    pts = rescale(sample.pts(), 1000).value
    dts = rescale(sample.dts(), 1000).value
    cts = pts - dts
    is_video = sample.media_type == MediaType.video
    csid = 0x6 if is_video else 0x4
    if is_video:
        frame_type = 0x10 if is_keyframe(sample) else 0x20
        header = bytes([0x7 | frame_type, 0 if send_config else 1,
                        (cts >> 16) & 0xFF, (cts >> 8) & 0xFF, cts & 0xFF])
    else:
        header = bytes([0xAF, 0 if send_config else 1])
    payload = sample.side_data().get("config", b"") if send_config \
        else sample.data()
    body = header + payload
    last = prev_dts.get(csid)
    delta = dts - last if last is not None else 0
    prev_dts[csid] = dts
    chunk = Chunk(msg_stream_id=msg_stream_id, msg_length=len(body),
                  msg_type=0x9 if is_video else 0x8, chunk_stream_id=csid,
                  timestamp=dts, timestamp_delta=delta, data=body)
    return serializer.serialize(chunk)


def create_metadata(descriptions: List, serializer: ChunkSerializer,
                    msg_stream_id: int) -> bytes:
    """@setDataFrame onMetaData (serialize.swift:57-90)."""
    props: Dict[str, object] = {"encoder": "swiftvideo-tpu 0.1",
                                "duration": 0.0, "filesize": 0.0}
    for desc in descriptions:
        if isinstance(desc, BasicVideoDescription):
            props.update({"width": float(desc.size[0]),
                          "height": float(desc.size[1]),
                          "videodatarate": 1000.0, "framerate": 30.0,
                          "videocodecid": "avc1"})
        elif isinstance(desc, BasicAudioDescription):
            props.update({"audiodatarate": 96.0,
                          "audiosamplerate": float(desc.sample_rate),
                          "audiosamplesize": 16.0,
                          "audiochannels": float(desc.channel_count),
                          "stereo": 1.0 if desc.channel_count > 1 else 0.0,
                          "audiocodecid": "mp4a"})
    payload = amf.serialize(["@setDataFrame", "onMetaData",
                             amf.EcmaArray(props)])
    chunk = Chunk(msg_stream_id=msg_stream_id, msg_length=len(payload),
                  msg_type=0x12, chunk_stream_id=0x6, timestamp=0,
                  timestamp_delta=0, data=payload)
    return serializer.serialize(chunk)


class MediaSerializer:
    """Config-resend + first-keyframe gating (rtmp.swift:562-609): media
    before a video keyframe (when a config exists and wasn't sent) is
    dropped; config packets precede the first data packet and are resent on
    config change."""

    def __init__(self, serializer: ChunkSerializer, msg_stream_id: int):
        self.serializer = serializer
        self.msg_stream_id = msg_stream_id
        self._prev_config: Dict[MediaType, bytes] = {}
        self._sent_first_keyframe = False
        self._prev_dts: Dict[int, int] = {}

    def serialize(self, sample: CodedMediaSample) -> Optional[bytes]:
        """Returns chunk bytes, or None when the sample is gated out."""
        cur = sample.side_data().get("config")
        prev = self._prev_config.get(sample.media_type)
        if cur is not None and prev == cur:
            return serialize_media(sample, self.serializer,
                                   self.msg_stream_id, self._prev_dts)
        if cur is not None:
            is_video = sample.media_type == MediaType.video
            if not is_video or self._sent_first_keyframe or is_keyframe(sample):
                head = serialize_media(sample, self.serializer,
                                       self.msg_stream_id, self._prev_dts,
                                       send_config=True)
                body = serialize_media(sample, self.serializer,
                                       self.msg_stream_id, self._prev_dts)
                if is_video:
                    self._sent_first_keyframe = True
                self._prev_config[sample.media_type] = cur
                return head + body
            return None
        return serialize_media(sample, self.serializer, self.msg_stream_id,
                               self._prev_dts)
