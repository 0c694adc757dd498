"""Wire-format test for the TCP visualization client."""
import socket
import struct
import threading

import numpy as np

from my_lidar_graph_slam_v2_tpu.network.slam_client import (
    GridMapParams,
    MSG_GRID_MAP_PARAMS,
    MSG_POSE_ARRAY,
    MSG_SCAN,
    MSG_STOP,
    SlamClient,
)
from my_lidar_graph_slam_v2_tpu.sensor.data import ScanData


def test_client_wire_format():
    received = bytearray()
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        while True:
            data = conn.recv(65536)
            if not data:
                break
            received.extend(data)
        conn.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()

    c = SlamClient("127.0.0.1", port)
    assert c.connect()
    params = GridMapParams()
    assert c.send_grid_map_params(params)
    times = [1.5, 2.5]
    poses = np.array([[1.0, 2.0, 0.1], [1.1, 2.1, 0.2]])
    assert c.send_pose_array(times, poses)
    scan = ScanData(
        "S", 3.0, np.zeros(3), np.zeros(3), np.array([0.08, 0.0, 0.0]),
        0.01, 20.0, -1.5, 1.5,
        np.linspace(-1.5, 1.5, 5), np.full(5, 2.0),
    )
    assert c.send_scan(scan)
    c.disconnect()
    th.join(timeout=5)
    server.close()

    buf = bytes(received)
    off = 0

    def u32():
        nonlocal off
        v = struct.unpack_from(">I", buf, off)[0]
        off += 4
        return v

    def i32():
        nonlocal off
        v = struct.unpack_from(">i", buf, off)[0]
        off += 4
        return v

    def d():
        nonlocal off
        v = struct.unpack_from(">d", buf, off)[0]
        off += 8
        return v

    # GridMapParams
    assert u32() == MSG_GRID_MAP_PARAMS
    assert d() == 0.05
    assert i32() == 16
    assert i32() == 100
    assert d() == 0.01 and d() == 20.0
    assert d() == 0.62 and d() == 0.46
    assert abs(d() - 0.62 / 0.38) < 1e-12
    assert abs(d() - 0.46 / 0.54) < 1e-12
    # PoseArray
    assert u32() == MSG_POSE_ARRAY
    assert u32() == 2
    vals = [d() for _ in range(8)]
    assert vals[:4] == [1.5, 1.0, 2.0, 0.1]
    # Scan
    assert u32() == MSG_SCAN
    assert u32() == 5
    assert d() == 3.0  # time
    assert d() == 0.08  # sensor pose x
    [d() for _ in range(2)]
    assert d() == 0.01 and d() == 20.0
    assert d() == -1.5 and d() == 1.5
    ranges = [d() for _ in range(5)]
    assert ranges == [2.0] * 5
    angles = [d() for _ in range(5)]
    assert angles[0] == -1.5 and angles[-1] == 1.5
    # Stop signal
    assert u32() == MSG_STOP
    assert off == len(buf)
