"""Network protocols: TCP transport, RTMP, flavor."""

from .tcp import Connection, NetworkEvent, tcp_client, tcp_serve, tls_client
from . import rtmp

__all__ = ["Connection", "NetworkEvent", "tcp_serve", "tcp_client",
           "tls_client", "rtmp"]
