import numpy as np

from bundlefusion_tpu.pipeline.trajectory import FrameState, TrajectoryManager


def T(tx=0.0, ty=0.0, tz=0.0):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [tx, ty, tz]
    return m


def test_reintegrate_ranking():
    tm = TrajectoryManager(top_n_active=2)
    for i in range(5):
        tm.add_frame(i, T(tz=float(i)))
    poses = np.stack([T(tz=float(i)) for i in range(5)])
    # move frames 1 and 3; frame 3 moves more
    poses[1][0, 3] += 0.05
    poses[3][0, 3] += 0.20
    poses[4][0, 3] += 0.01
    tm.update_optimized_transforms(poses, np.ones(5, bool))
    deint, reint, integ = tm.generate_update_lists()
    assert deint == []
    assert reint == [3, 1]  # top_n_active=2, sorted by delta desc
    assert integ == []


def test_invalidation_flow():
    tm = TrajectoryManager()
    tm.add_frame(0, T())
    tm.add_frame(1, T(tz=1.0))
    poses = np.stack([T(), T(tz=1.0)])
    valid = np.array([True, False])
    tm.update_optimized_transforms(poses, valid)
    deint, reint, integ = tm.generate_update_lists()
    assert deint == [1]
    tm.mark_deintegrated(1)
    assert tm.records[1].state == FrameState.NOT_INTEGRATED
    # revalidation: frame 1 becomes valid again -> goes to integrate list
    tm.update_optimized_transforms(poses, np.array([True, True]))
    deint, reint, integ = tm.generate_update_lists()
    assert integ == [1]
    tm.mark_integrated(1, poses[1])
    assert tm.num_integrated() == 2


def test_never_integrated_tracked():
    tm = TrajectoryManager()
    tm.add_frame(0, None)  # tracking lost at integration time
    poses = np.stack([T(tx=0.3)])
    tm.update_optimized_transforms(poses, np.ones(1, bool))
    deint, reint, integ = tm.generate_update_lists()
    assert integ == [0]
