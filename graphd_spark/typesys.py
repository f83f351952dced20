"""The core type system: namespaces, HAS_KEY links, type-name binding.

graphd compiles "schema last": types are themselves primitives, bound
to names through ``has_key`` links inside namespaces (ref
graphd/graphd-type.c).  The first write that mentions a type *string*
bootstraps a 7-primitive core (graphd_type_bootstrap,
graphd-type.c:899-1030):

  0  name=CORE_SCOPE
  1  name=ROOT_NAMESPACE                          scope=0
  2  name=HAS_KEY                                 scope=0
  3  (the bootstrap namespace)                    scope=0
  4  root_ns -has_key-> bootstrap_ns  value="boot"            scope=0
  5  bootstrap_ns -has_key-> root_ns  value="root_namespace"  scope=0
  6  bootstrap_ns -has_key-> HAS_KEY  name=Metaweb_Bootstrap_Anchor
                                      value="has_key"         scope=0

After that, each new type name creates two primitives
(make_node_has_key, graphd-type.c:660-790): an anonymous node and a
``has_key`` link from the bootstrap namespace carrying the name as its
value.  Lookups are case-insensitive (strncasecmp throughout).
"""

from __future__ import annotations

from typing import Optional

from graphd_spark.store import PrimitiveStore


class TypeSystem:
    """Resolves type names <-> typeguids over a PrimitiveStore."""

    def __init__(self, store: PrimitiveStore):
        self.store = store
        self.core_scope: Optional[str] = None
        self.namespace_root: Optional[str] = None
        self.namespace_bootstrap: Optional[str] = None
        self.attribute_has_key: Optional[str] = None

    # -- bootstrap --------------------------------------------------------

    def _read_bootstrap(self) -> bool:
        """graphd_type_bootstrap_read: recover handles from the log."""
        for p in self.store.find_by_name("ROOT_NAMESPACE"):
            if p.scope is not None and self.store.is_newest(p.guid) and p.live:
                self.namespace_root = p.guid
                self.core_scope = p.scope
                break
        else:
            return False
        for p in self.store.find_by_name("Metaweb_Bootstrap_Anchor"):
            if (
                p.scope is not None
                and p.left is not None
                and p.right is not None
                and p.typeguid is not None
                and self.store.is_newest(p.guid)
                and p.live
            ):
                self.namespace_bootstrap = p.left
                self.attribute_has_key = p.right
                return True
        return False

    def ensure_bootstrap(self) -> None:
        """Create the 7-primitive core on first need (graphd_type_bootstrap)."""
        if self.attribute_has_key is not None:
            return
        if self._read_bootstrap():
            return
        s = self.store
        core = s.append(name="CORE_SCOPE").guid
        root_ns = s.append(name="ROOT_NAMESPACE", scope=core).guid
        has_key = s.append(name="HAS_KEY", scope=core).guid
        boot_ns = s.append(scope=core).guid
        s.append(
            left=root_ns, right=boot_ns, typeguid=has_key, scope=core,
            value="boot",
        )
        s.append(
            left=boot_ns, right=root_ns, typeguid=has_key, scope=core,
            value="root_namespace",
        )
        s.append(
            left=boot_ns, right=has_key, typeguid=has_key, scope=core,
            name="Metaweb_Bootstrap_Anchor", value="has_key",
        )
        self.core_scope = core
        self.namespace_root = root_ns
        self.namespace_bootstrap = boot_ns
        self.attribute_has_key = has_key

    # -- lookup -----------------------------------------------------------

    def _find_named(self, name: str) -> Optional[str]:
        """Find the node a has_key link binds to ``name`` (case-insensitive).

        Mirrors make_node_has_key's search loop: any live, newest
        ``has_key`` link with both endpoints and a matching value is
        accepted, even outside the expected namespace
        (graphd-type.c:700-745 "I'll take it").
        """
        if self.attribute_has_key is None and not self._read_bootstrap():
            return None
        for p in self.store.find_by_value(name):
            if (
                p.typeguid == self.attribute_has_key
                and p.left is not None
                and p.right is not None
                and p.live
                and p.value is not None
                and p.value.lower() == name.lower()
                and self.store.is_newest(p.guid)
            ):
                return p.right
        return None

    def resolve(self, name: str) -> Optional[str]:
        """Type name -> typeguid for reads; None when unknown."""
        return self._find_named(name)

    def type_name(self, typeguid: str) -> Optional[str]:
        """typeguid -> name (for the ``type`` result pattern).

        Reverse of resolve: the newest live has_key link whose right is
        the typeguid supplies the name from its value
        (graphd_type_value_from_guid).
        """
        if self.attribute_has_key is None and not self._read_bootstrap():
            return None
        for p in self.store.iter_all():
            if (
                p.typeguid == self.attribute_has_key
                and p.right == typeguid
                and p.left is not None
                and p.live
                and p.value is not None
                and self.store.is_newest(p.guid)
            ):
                return p.value
        return None

    # -- create (write path) ----------------------------------------------

    def make_name(self, name: str) -> str:
        """Look up or create the type object for ``name``.

        graphd_type_make_name: bootstrap if needed, search, else create
        the anonymous node + has_key link in the *root* namespace
        (ref graphd-type.c:1077 make_node_has_key(g_namespace_root)).
        """
        self.ensure_bootstrap()
        found = self._find_named(name)
        if found is not None:
            return found
        node = self.store.append(scope=self.core_scope).guid
        self.store.append(
            left=self.namespace_root,
            right=node,
            typeguid=self.attribute_has_key,
            scope=self.core_scope,
            value=name,
        )
        return node
