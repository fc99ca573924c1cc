"""Crawl-schedule planner — the reference's rotation/schedule/assignment
unit cases ported (src/scheduler/*.rs test mods)."""

from datetime import date

import pytest

from baram_ray.scheduler import (CATEGORIES, INSTANCES, CategoryAssigner,
                                 CategoryConfig, DailySchedule, HourlySlot,
                                 RotationScheduler, daily_rotation)


def test_rotation_deterministic():
    d = date(2024, 1, 15)
    assert daily_rotation(d) == daily_rotation(d)


def test_rotation_contains_all_instances():
    for day in range(1, 28):
        rot = daily_rotation(date(2024, 3, day))
        assert sorted(rot) == sorted(INSTANCES)


def test_rotation_different_dates_decorrelated():
    rots = {tuple(daily_rotation(date(2024, 1, d))) for d in range(1, 31)}
    assert len(rots) > 1          # not the same permutation every day


def test_get_instance_for_hour_and_pattern():
    s = RotationScheduler()
    d = date(2024, 1, 15)
    rot = s.get_daily_rotation(d)
    for hour in range(24):
        assert s.get_instance_for_hour(d, hour) == rot[hour % 3]
    with pytest.raises(ValueError):
        s.get_instance_for_hour(d, 24)


def test_categories_per_slot_cyclic():
    s = RotationScheduler(categories_per_slot=2)
    seen = set()
    for hour in range(24):
        cats = s.get_categories_for_slot(hour)
        assert len(cats) == 2
        seen.update(cats)
    assert seen == set(CATEGORIES)     # cyclic coverage hits every category


def test_daily_schedule_structure_valid_summary():
    s = RotationScheduler()
    d = date(2024, 1, 15)
    sched = s.generate_daily_schedule(d)
    assert sched.is_valid()
    assert len(sched.slots) == 24
    summ = sched.summary()
    assert summ["total_slots"] == 24
    # 24 hours over 3 instances = 8 slots each
    assert all(v == 8 for v in summ["instance_distribution"].values())


def test_is_instance_active_and_next_slot():
    s = RotationScheduler()
    d = date(2024, 1, 15)
    inst = s.get_instance_for_hour(d, 0)
    assert s.is_instance_active(inst, d, 0)
    nxt = s.get_next_slot_for_instance(inst, d, 0)
    assert nxt == 3                    # 3-instance rotation: next is +3


def test_schedule_json_roundtrip():
    s = RotationScheduler()
    sched = s.generate_daily_schedule(date(2024, 1, 15))
    back = DailySchedule.from_json(sched.to_json())
    assert back == sched


def test_hourly_slot_display():
    slot = HourlySlot(9, "main", ["politics", "it"])
    assert slot.display() == "09:00 [main] politics, it"


def test_assigner_round_robin():
    a = CategoryAssigner()
    c0 = a.assign_categories_to_slot(0, "main")
    c1 = a.assign_categories_to_slot(1, "main")
    assert len(c0) == 2 and len(c1) == 2
    assert c0 != c1                    # rotates


def test_assigner_disabled_category_skipped():
    a = CategoryAssigner()
    a.set_enabled("politics", False)
    for hour in range(24):
        assert "politics" not in a.assign_categories_to_slot(hour, "main")


def test_assigner_excluded_instance():
    # with the exclusion, economy cannot come from the weighted
    # selection for sub1; without it, critical priority puts it first
    a = CategoryAssigner(strategy="weighted")
    a.configure_category(CategoryConfig(
        "economy", priority="critical", excluded_instances=("sub1",)))
    cands = [c.category for c in a.configs.values()
             if c.enabled and c.can_assign_to("sub1")]
    assert "economy" not in cands
    b = CategoryAssigner(strategy="weighted")
    b.configure_category(CategoryConfig("economy", priority="critical"))
    assert "economy" in b._weighted(0, "sub1")


def test_assigner_load_balanced_rotates():
    a = CategoryAssigner(strategy="load_balanced")
    first = a.assign_categories_to_slot(0, "main")
    second = a.assign_categories_to_slot(0, "main")
    assert first != second             # load counter advances the offset


def test_assigner_affinity_sticks():
    a = CategoryAssigner(strategy="affinity")
    first = a.assign_categories_to_slot(0, "main")
    again = a.assign_categories_to_slot(5, "main")
    # categories assigned once to main come back for main
    assert set(first) & set(again)


def test_generate_schedule_with_assigner():
    a = CategoryAssigner(strategy="weighted")
    rot = daily_rotation(date(2024, 5, 1))
    sched = a.generate_schedule(date(2024, 5, 1), rot)
    assert sched.is_valid()
    assert a.stats()["enabled"] == len(CATEGORIES)
