"""SimulEval-compatible agent core (the environment has no simuleval package, so the
minimal Segment/Action/AgentStates/agent-pipeline surface is provided here —
semantics mirror simuleval.agents.* as used by the reference streaming layer,
streaming/agents/common.py:15-35 and unity_pipeline.py:155-243)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional


@dataclass
class Segment:
    content: Any = None
    finished: bool = False
    tgt_lang: Optional[str] = None
    is_empty: bool = False

    @property
    def data_type(self):
        return type(self).__name__


@dataclass
class EmptySegment(Segment):
    is_empty: bool = True


@dataclass
class SpeechSegment(Segment):
    sample_rate: int = 16000


@dataclass
class TextSegment(Segment):
    pass


class ReadAction:
    pass


class WriteAction:
    def __init__(self, content: Any, finished: bool = False):
        self.content = content
        self.finished = finished


class AgentStates:
    """Base streaming state. The reference variant does NOT accumulate target
    (streaming/agents/common.py:15-27)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.source: list = []
        self.source_finished = False
        self.target_finished = False
        self.tgt_lang: Optional[str] = None

    def update_source(self, segment: Segment) -> None:
        self.source_finished = segment.finished
        if self.tgt_lang is None and segment.tgt_lang is not None:
            self.tgt_lang = segment.tgt_lang
        if not segment.is_empty:
            self.source.append(segment.content)

    def update_target(self, segment: Segment) -> None:
        self.target_finished = segment.finished


class GenericAgent:
    source_type: str = "speech"
    target_type: str = "speech"

    def __init__(self, args=None):
        self.args = args
        self.states = self.build_states()

    def build_states(self) -> AgentStates:
        return AgentStates()

    def reset(self) -> None:
        self.states.reset()

    def policy(self, states: AgentStates):
        raise NotImplementedError

    def push(self, segment: Segment) -> None:
        self.states.update_source(segment)

    def pop(self) -> Segment:
        action = self.policy(self.states)
        if isinstance(action, ReadAction):
            return EmptySegment(finished=self.states.target_finished)
        seg = action.content if isinstance(action.content, Segment) else Segment(
            content=action.content, finished=action.finished,
            tgt_lang=self.states.tgt_lang)
        seg.finished = action.finished
        self.states.update_target(seg)
        return seg


class EarlyStoppingMixin:
    def reset_early(self) -> None:
        raise NotImplementedError


class AgentPipeline:
    """Chain of agents; each push/pop cycles every agent in order
    (reference UnitYAgentPipeline.pop restart-on-early-EOS at
    unity_pipeline.py:172-190)."""

    def __init__(self, agents: List[GenericAgent]):
        self.agents = agents

    def reset(self) -> None:
        for a in self.agents:
            a.reset()

    def process(self, segment: Segment) -> List[Segment]:
        """Feed one source segment; return all output segments produced."""
        outputs: List[Segment] = []
        seg = segment
        for i, agent in enumerate(self.agents):
            agent.push(seg)
            seg = agent.pop()
            if seg.is_empty and not seg.finished:
                return outputs
        if not seg.is_empty or seg.finished:
            outputs.append(seg)
        return outputs
