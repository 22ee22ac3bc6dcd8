"""Structured Streaming plane (SURVEY.md §2.9).

The reference's streaming plane is a hand-built producer: JDBC pull →
calendar expansion → priority queue → paced synchronous Kafka sends
(``GtfsArrivalsProducer.java``). Here the same semantics are
Structured Streaming queries; the window/session wrappers run
identically in batch (oracle-checkable twins, SURVEY.md §7
hard-part 6) and under ``readStream``.
"""
