package graft.queries
