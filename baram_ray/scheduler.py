"""Crawl scheduling domain model (T1's PLANNING half) — the reference's
``src/scheduler/{rotation,schedule,assignment}.rs`` as pure Python: who
crawls which category at which hour. The EXECUTION half (heartbeats,
failover, task placement) is subsumed by Ray and intentionally absent;
the planner below is the part a user of the reference's ``distributed``
command still needs.

Semantics ported:

- ``CrawlerInstance`` main/sub1/sub2 with ids + Korean labels
  (rotation.rs:25-100);
- date-seeded DETERMINISTIC daily rotation (rotation.rs:255-265 —
  the reference shuffles with ChaCha8 seeded by days-from-CE; the
  portable CONTRACT is "deterministic uniform permutation keyed by
  date", reproduced here via blake2b(date ordinal) selecting the
  permutation — the exact permutation values differ from rand_chacha's
  stream, every distribution/determinism property is identical);
- cyclic category slots, 24-slot daily schedule, validity, summary,
  JSON roundtrip (rotation.rs:292-330, schedule.rs:69-230);
- ``CategoryAssigner`` with RoundRobin / Weighted / LoadBalanced /
  Affinity strategies, priority weights+slot multipliers, preferred/
  excluded instance constraints (assignment.rs:19-455).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from datetime import date as _date

INSTANCES = ("main", "sub1", "sub2")
INSTANCE_LABELS = {"main": "메인", "sub1": "서브1", "sub2": "서브2"}

from baram_ray.urls import NEWS_CATEGORIES  # noqa: E402  (category ids)

CATEGORIES = tuple(NEWS_CATEGORIES)          # insertion order = id order

PRIORITY_WEIGHT = {"low": 0.5, "normal": 1.0, "high": 1.5, "critical": 2.0}
PRIORITY_SLOTS = {"low": 1, "normal": 2, "high": 3, "critical": 4}
_PRIORITY_ORD = {"low": 1, "normal": 2, "high": 3, "critical": 4}


@dataclass
class CategoryConfig:
    category: str
    priority: str = "normal"
    enabled: bool = True
    preferred_instances: tuple[str, ...] = ()
    excluded_instances: tuple[str, ...] = ()
    max_articles: int | None = None
    min_interval_hours: int = 1

    def can_assign_to(self, instance: str) -> bool:
        if instance in self.excluded_instances:
            return False
        if self.preferred_instances and \
                instance not in self.preferred_instances:
            return False
        return True


@dataclass
class HourlySlot:
    hour: int
    instance: str
    categories: list[str]

    def is_for_instance(self, instance: str) -> bool:
        return self.instance == instance

    def display(self) -> str:
        cats = ", ".join(self.categories)
        return f"{self.hour:02d}:00 [{self.instance}] {cats}"


@dataclass
class DailySchedule:
    date: str                              # ISO yyyy-mm-dd
    slots: list[HourlySlot] = field(default_factory=list)

    def get_slot(self, hour: int) -> HourlySlot | None:
        return next((s for s in self.slots if s.hour == hour), None)

    def slots_for_instance(self, instance: str) -> list[HourlySlot]:
        return [s for s in self.slots if s.instance == instance]

    def instance_at_hour(self, hour: int) -> str | None:
        s = self.get_slot(hour)
        return s.instance if s else None

    def categories_at_hour(self, hour: int) -> list[str]:
        s = self.get_slot(hour)
        return list(s.categories) if s else []

    def is_valid(self) -> bool:
        return (len(self.slots) == 24
                and all(s.hour == i for i, s in enumerate(self.slots)))

    def summary(self) -> dict:
        inst: dict[str, int] = {}
        cats: dict[str, int] = {}
        for s in self.slots:
            inst[s.instance] = inst.get(s.instance, 0) + 1
            for c in s.categories:
                cats[c] = cats.get(c, 0) + 1
        return {"date": self.date, "total_slots": len(self.slots),
                "instance_distribution": inst,
                "category_distribution": cats}

    def to_json(self) -> str:
        return json.dumps({
            "date": self.date,
            "slots": [{"hour": s.hour, "instance": s.instance,
                       "categories": s.categories} for s in self.slots]})

    @classmethod
    def from_json(cls, s: str) -> "DailySchedule":
        d = json.loads(s)
        return cls(d["date"],
                   [HourlySlot(x["hour"], x["instance"],
                               list(x["categories"]))
                    for x in d["slots"]])


def _permutation_index(seed: int, n_fact: int) -> int:
    h = hashlib.blake2b(seed.to_bytes(8, "big"), digest_size=8).digest()
    return int.from_bytes(h, "big") % n_fact


def daily_rotation(date: _date,
                   instances: tuple[str, ...] = INSTANCES) -> list[str]:
    """Deterministic uniform permutation of ``instances`` keyed by the
    date's ordinal (reference contract: same date → same order, all
    instances present, distinct dates decorrelated)."""
    import itertools
    perms = sorted(itertools.permutations(instances))
    return list(perms[_permutation_index(date.toordinal(), len(perms))])


class RotationScheduler:
    """rotation.rs RotationScheduler: date-keyed instance rotation +
    cyclic category slots."""

    def __init__(self, categories_per_slot: int = 2,
                 instances: tuple[str, ...] = INSTANCES,
                 categories: tuple[str, ...] = CATEGORIES):
        self.categories_per_slot = categories_per_slot
        self.instances = instances
        self.categories = categories

    def get_daily_rotation(self, date: _date) -> list[str]:
        return daily_rotation(date, self.instances)

    def get_instance_for_hour(self, date: _date, hour: int) -> str:
        if not 0 <= hour <= 23:
            raise ValueError(f"invalid hour: {hour}")
        rot = self.get_daily_rotation(date)
        return rot[hour % len(rot)]

    def get_categories_for_slot(self, hour: int) -> list[str]:
        start = (hour * self.categories_per_slot) % len(self.categories)
        out = []
        i = start
        for _ in range(self.categories_per_slot):
            out.append(self.categories[i % len(self.categories)])
            i += 1
        return out

    def generate_daily_schedule(self, date: _date) -> DailySchedule:
        rot = self.get_daily_rotation(date)
        slots = [HourlySlot(h, rot[h % len(rot)],
                            self.get_categories_for_slot(h))
                 for h in range(24)]
        return DailySchedule(date.isoformat(), slots)

    def is_instance_active(self, instance: str, date: _date,
                           hour: int) -> bool:
        return self.get_instance_for_hour(date, hour) == instance

    def get_next_slot_for_instance(self, instance: str, date: _date,
                                   after_hour: int) -> int | None:
        rot = self.get_daily_rotation(date)
        for hour in range(after_hour + 1, 24):
            if rot[hour % len(rot)] == instance:
                return hour
        return None


class CategoryAssigner:
    """assignment.rs CategoryAssigner: four strategies over per-category
    configs."""

    def __init__(self, strategy: str = "round_robin",
                 categories_per_slot: int = 2):
        self.configs: dict[str, CategoryConfig] = {
            c: CategoryConfig(c) for c in CATEGORIES}
        self.strategy = strategy
        self.categories_per_slot = categories_per_slot
        self.instance_loads: dict[str, int] = {}
        self.category_affinity: dict[str, str] = {}

    def configure_category(self, config: CategoryConfig) -> None:
        self.configs[config.category] = config

    def set_priority(self, category: str, priority: str) -> None:
        self.configs[category].priority = priority

    def set_enabled(self, category: str, enabled: bool) -> None:
        self.configs[category].enabled = enabled

    def enabled_categories(self) -> list[str]:
        return [c for c in CATEGORIES if self.configs[c].enabled]

    def categories_by_priority(self) -> list[str]:
        return sorted(self.enabled_categories(),
                      key=lambda c: -_PRIORITY_ORD[self.configs[c].priority])

    # -- strategies ---------------------------------------------------- #

    def _round_robin(self, hour: int) -> list[str]:
        enabled = self.enabled_categories()
        if not enabled:
            return []
        start = (hour * self.categories_per_slot) % len(enabled)
        return [enabled[(start + i) % len(enabled)]
                for i in range(self.categories_per_slot)]

    def _weighted(self, hour: int, instance: str) -> list[str]:
        cands = [c for c in self.configs.values()
                 if c.enabled and c.can_assign_to(instance)]
        cands.sort(key=lambda c: -_PRIORITY_ORD[c.priority])
        result: list[str] = []
        remaining = self.categories_per_slot
        for cfg in cands:
            if remaining == 0:
                break
            slots = min(PRIORITY_SLOTS[cfg.priority], remaining)
            if (hour % 4) < slots:
                result.append(cfg.category)
                remaining -= 1
        if len(result) < self.categories_per_slot:
            for cat in self._round_robin(hour):
                if cat not in result \
                        and len(result) < self.categories_per_slot:
                    result.append(cat)
        return result

    def _load_balanced(self, hour: int, instance: str) -> list[str]:
        self.instance_loads[instance] = \
            self.instance_loads.get(instance, 0) + 1
        available = [c.category for c in self.configs.values()
                     if c.enabled and c.can_assign_to(instance)]
        if not available:
            return self._round_robin(hour)
        load = self.instance_loads[instance]
        offset = (hour + load) % len(available)
        rotated = available[offset:] + available[:offset]
        return rotated[:self.categories_per_slot]

    def _affinity(self, hour: int, instance: str) -> list[str]:
        result: list[str] = []
        for category, affine in self.category_affinity.items():
            if affine == instance and len(result) < self.categories_per_slot:
                cfg = self.configs.get(category)
                if cfg and cfg.enabled and cfg.can_assign_to(instance):
                    result.append(category)
        if len(result) < self.categories_per_slot:
            for cat in self._round_robin(hour):
                if cat not in result \
                        and len(result) < self.categories_per_slot:
                    result.append(cat)
                    self.category_affinity[cat] = instance
        return result

    def assign_categories_to_slot(self, hour: int,
                                  instance: str) -> list[str]:
        if self.strategy == "round_robin":
            return self._round_robin(hour)
        if self.strategy == "weighted":
            return self._weighted(hour, instance)
        if self.strategy == "load_balanced":
            return self._load_balanced(hour, instance)
        if self.strategy == "affinity":
            return self._affinity(hour, instance)
        raise ValueError(f"unknown strategy: {self.strategy}")

    def generate_schedule(self, date: _date,
                          instance_rotation: list[str]) -> DailySchedule:
        slots = []
        for hour in range(24):
            instance = instance_rotation[hour % len(instance_rotation)]
            slots.append(HourlySlot(
                hour, instance,
                self.assign_categories_to_slot(hour, instance)))
        return DailySchedule(date.isoformat(), slots)

    def stats(self) -> dict:
        dist: dict[str, int] = {}
        for c in self.configs.values():
            if c.enabled:
                dist[c.priority] = dist.get(c.priority, 0) + 1
        return {"enabled": len(self.enabled_categories()),
                "priority_distribution": dist,
                "strategy": self.strategy}

    def reset_loads(self) -> None:
        self.instance_loads.clear()

    def clear_affinity(self) -> None:
        self.category_affinity.clear()
