"""ZMQ queue wrappers with msgpack framing (sync + asyncio).

Counterpart of /root/reference/python/minisgl/utils/mp.py:12-151 — the process
control plane of the serving stack: PUSH/PULL for point-to-point streams, PUB/
SUB for replicating the request stream to lockstep scheduler peers on other
hosts. Payload encoding delegates to minisgl_tpu.message.serde.
"""

from __future__ import annotations

from typing import Any, Callable, Generic, List, TypeVar

import zmq
import zmq.asyncio

T = TypeVar("T")


def _encode(obj: Any) -> bytes:
    from minisgl_tpu.message.serde import dumps

    return dumps(obj)


def _decode(data: bytes) -> Any:
    from minisgl_tpu.message.serde import loads

    return loads(data)


class _ZmqBase(Generic[T]):
    def __init__(self, ctx: zmq.Context, sock_type: int, addr: str, bind: bool):
        self.socket = ctx.socket(sock_type)
        # Serving-plane sockets should never drop or linger on shutdown.
        self.socket.setsockopt(zmq.LINGER, 0)
        if sock_type in (zmq.PUB, zmq.SUB):
            self.socket.setsockopt(zmq.SNDHWM, 0)
            self.socket.setsockopt(zmq.RCVHWM, 0)
        if sock_type == zmq.SUB:
            self.socket.setsockopt(zmq.SUBSCRIBE, b"")
        if bind:
            self.socket.bind(addr)
        else:
            self.socket.connect(addr)

    def stop(self) -> None:
        self.socket.close()


class ZmqPushQueue(_ZmqBase[T]):
    def __init__(self, addr: str, bind: bool = False, ctx: zmq.Context | None = None):
        super().__init__(ctx or zmq.Context.instance(), zmq.PUSH, addr, bind)

    def put(self, msg: T) -> None:
        self.socket.send(_encode(msg))

    def put_raw(self, data: bytes) -> None:
        self.socket.send(data)


class ZmqPullQueue(_ZmqBase[T]):
    def __init__(self, addr: str, bind: bool = True, ctx: zmq.Context | None = None):
        super().__init__(ctx or zmq.Context.instance(), zmq.PULL, addr, bind)

    def get(self, block: bool = True) -> T | None:
        flags = 0 if block else zmq.NOBLOCK
        try:
            return _decode(self.socket.recv(flags))
        except zmq.Again:
            return None

    def get_raw(self, block: bool = True) -> bytes | None:
        flags = 0 if block else zmq.NOBLOCK
        try:
            return self.socket.recv(flags)
        except zmq.Again:
            return None

    def drain(self, first_block: bool) -> List[T]:
        """Get all currently available messages (blocking for the first when
        first_block). The scheduler idle loop uses this to batch msg intake."""
        out: List[T] = []
        msg = self.get(block=first_block)
        if msg is None:
            return out
        out.append(msg)
        while (msg := self.get(block=False)) is not None:
            out.append(msg)
        return out


class ZmqPubQueue(_ZmqBase[T]):
    def __init__(self, addr: str, bind: bool = True, ctx: zmq.Context | None = None):
        super().__init__(ctx or zmq.Context.instance(), zmq.PUB, addr, bind)

    def put_raw(self, data: bytes) -> None:
        self.socket.send(data)


class ZmqSubQueue(_ZmqBase[T]):
    def __init__(self, addr: str, bind: bool = False, ctx: zmq.Context | None = None):
        super().__init__(ctx or zmq.Context.instance(), zmq.SUB, addr, bind)

    def get_raw(self, block: bool = True) -> bytes | None:
        flags = 0 if block else zmq.NOBLOCK
        try:
            return self.socket.recv(flags)
        except zmq.Again:
            return None


class ZmqAsyncPushQueue(Generic[T]):
    def __init__(self, addr: str, bind: bool = False):
        ctx = zmq.asyncio.Context.instance()
        self.socket = ctx.socket(zmq.PUSH)
        self.socket.setsockopt(zmq.LINGER, 0)
        (self.socket.bind if bind else self.socket.connect)(addr)

    async def put(self, msg: T) -> None:
        await self.socket.send(_encode(msg))

    def stop(self) -> None:
        self.socket.close()


class ZmqAsyncPullQueue(Generic[T]):
    def __init__(self, addr: str, bind: bool = True):
        ctx = zmq.asyncio.Context.instance()
        self.socket = ctx.socket(zmq.PULL)
        self.socket.setsockopt(zmq.LINGER, 0)
        (self.socket.bind if bind else self.socket.connect)(addr)

    async def get(self) -> T:
        return _decode(await self.socket.recv())

    def stop(self) -> None:
        self.socket.close()
